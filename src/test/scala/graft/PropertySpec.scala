package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ChunkKernel, HashEmbedKernel, TextKernels, VectorKernels}
import graft.store.FilterCompiler

/** Property-based tests (SURVEY.md §5: filter-compiler ⇄ reference-semantics
  * equivalence + kernel invariants), using scalacheck generators with a
  * fixed-seed sampling loop (no scalatestplus bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] = {
    val params = org.scalacheck.Gen.Parameters.default
    (0 until n).flatMap(i =>
      gen.apply(params, org.scalacheck.rng.Seed(42L + i)))
  }

  private def arr(values: Seq[Float]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(values.toArray)

  private val vecGen: Gen[List[Float]] =
    Gen.chooseNum(1, 16).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f)))

  test("vector kernel invariants over 200 random vectors") {
    samples(vecGen, 200).foreach { v =>
      val a = arr(v)
      val c = VectorKernels.cosineF(a, a)
      if (v.exists(_ != 0f)) assert(math.abs(c - 1.0) < 1e-6) else assert(c == 0.0)
      val l1 = VectorKernels.normL1F(a); val l2 = VectorKernels.normL2F(a)
      val mx = VectorKernels.normMaxF(a)
      assert(l1 >= -1e-9 && l2 <= l1 + 1e-6 && mx <= l2 + 1e-6)
      if (v.exists(_ != 0f)) {
        val n = VectorKernels.normalizeF(a, l2)
        assert(math.abs(VectorKernels.normL2F(n) - 1.0) < 1e-4)
      }
      assert(VectorKernels.distL2F(a, a) == 0.0)
      assert(math.abs(VectorKernels.dotF(a, a) - l2 * l2) < math.max(1e-3, l2 * l2 * 1e-6))
    }
  }

  test("quantization kernel invariants over random vectors") {
    import graft.functions.QuantKernels
    val pairGen: Gen[(List[Float], List[Float])] = for {
      n <- Gen.chooseNum(1, 200)
      a <- Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f))
      b <- Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f))
    } yield (a, b)
    samples(pairGen, 200).foreach { case (av, bv) =>
      val a = arr(av); val b = arr(bv)
      val sa = QuantKernels.signPackF(a); val sb = QuantKernels.signPackF(b)
      // word count, identity, symmetry, range, exact mismatch count
      assert(sa.numElements() == (av.length + 63) / 64)
      assert(QuantKernels.hammingWords(sa, sa) == 0)
      val h = QuantKernels.hammingWords(sa, sb)
      assert(h == QuantKernels.hammingWords(sb, sa))
      assert(h >= 0 && h <= av.length)
      val want = av.indices.count(i => (av(i) > 0f) != (bv(i) > 0f))
      assert(h == want)
      // padding bits beyond dim must never contribute
      if (av.length % 64 != 0)
        assert((sa.getLong(sa.numElements() - 1) >>> (av.length % 64)) == 0L)
    }
    // sq8: code range, degenerate dims, reconstruction bound for in-range v
    samples(vecGen, 200).foreach { v =>
      val a = arr(v)
      val mins = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(x => x.toDouble - 1.0).toArray)
      val scales = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.indices.map(i => if (i % 3 == 0) 0.0 else 0.01).toArray)
      val codes = QuantKernels.sq8EncodeF(a, mins, scales)
      codes.indices.foreach { i =>
        val c = codes(i) & 0xFF
        if (i % 3 == 0) assert(c == 0) // degenerate dim
        else assert(c >= 0 && c <= 255)
      }
    }
  }

  test("embedder contract: fixed dim, unit norm, deterministic") {
    samples(Gen.alphaStr.suchThat(_.trim.nonEmpty), 100).foreach { text =>
      val u = UTF8String.fromString(text)
      val e1 = HashEmbedKernel.embed(u, 32).toFloatArray()
      val e2 = HashEmbedKernel.embed(u, 32).toFloatArray()
      assert(e1.length == 32 && e1.toSeq == e2.toSeq)
      val norm = math.sqrt(e1.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("chunker invariants: size bound and no content loss") {
    val textGen = for {
      words <- Gen.chooseNum(1, 60)
      ws <- Gen.listOfN(words, Gen.oneOf("alpha", "beta", "gamma", "delta", "x"))
    } yield ws.mkString(" ")
    samples(Gen.zip(textGen, Gen.chooseNum(10, 80)), 100).foreach { case (text, size) =>
      val chunks = ChunkKernel.chunk(text, size, size / 4)
      assert(chunks.forall(_.length <= size), s"oversize chunk for size=$size")
      val joined = chunks.mkString(" ")
      text.sliding(3).filter(_.trim.length == 3).foreach(tri =>
        assert(joined.contains(tri), s"lost trigram '$tri' for size=$size"))
    }
  }

  test("named splitters: character keeps oversized splits, markdown cuts at headings") {
    // character: split on \n\n only, merge to size; an oversized paragraph
    // is emitted WHOLE (langchain CharacterTextSplitter warns, never cuts)
    val para = "word " * 30 // 150 chars, no \n
    val charChunks = ChunkKernel.chunk(
      s"short one\n\n${para.trim}\n\nshort two", 40, 0,
      ChunkKernel.setIdFor("character"))
    assert(charChunks.contains(para.trim), "oversized paragraph was cut")
    assert(charChunks.exists(_.contains("short one")))
    // markdown: heading separators cut BEFORE prose separators, so two h2
    // sections land in distinct chunks even when \n\n would merge them
    val md = "## alpha\nintro text here\n## beta\nmore text here"
    val mdChunks = ChunkKernel.chunk(md, 30, 0, ChunkKernel.setIdFor("markdown"))
    assert(mdChunks.exists(c => c.contains("alpha") && !c.contains("beta")))
    assert(mdChunks.exists(c => c.contains("beta") && !c.contains("alpha")))
    // recursive default unchanged by the refactor
    assert(ChunkKernel.chunk(md, 30, 0).sameElements(
      ChunkKernel.chunk(md, 30, 0, ChunkKernel.setIdFor("recursive_character"))))
    // unknown splitter refused loudly
    intercept[IllegalArgumentException](ChunkKernel.setIdFor("semantic"))
  }

  test("markdown splitter keeps heading markers across chunk boundaries (keep_separator)") {
    // every section after the first starts a new chunk — under LangChain's
    // keep_separator=True the '## ' marker rides at the chunk's head
    // instead of being consumed by the split
    val md = "## alpha\nintro text here\n## beta\nmore text here\n## gamma\nfinal text"
    val chunks = ChunkKernel.chunk(md, 30, 0, ChunkKernel.setIdFor("markdown"))
    Seq("beta", "gamma").foreach { h =>
      val chunk = chunks.find(_.contains(h)).get
      assert(chunk.contains(s"## $h"),
        s"section '$h' lost its heading marker: '$chunk'")
    }
    // with no overlap the chunks concatenate back to the original text
    // verbatim — separators are neither lost nor doubled
    val mid = ChunkKernel.chunk(md, 50, 0, ChunkKernel.setIdFor("markdown"))
    assert(mid.length > 1 && mid.mkString("") == md,
      s"lossless reconstruction failed: ${mid.toSeq}")
  }

  test("char-ngram buckets: window count, bucket range, case/lowering invariants") {
    val textGen = Gen.listOfN(30, Gen.oneOf(
      Gen.alphaChar, Gen.oneOf(' ', 'ü', 'é', '的'))).map(_.mkString)
    samples(textGen, 200).foreach { t =>
      val u = UTF8String.fromString(t)
      val out = TextKernels.charNgramFnvBuckets(u, 2, 1024).toIntArray()
      // one window per adjacent char pair of the lowered text
      assert(out.length == math.max(0, t.toLowerCase(java.util.Locale.ROOT).length - 1))
      assert(out.forall(b => b >= 0 && b < 1024), s"bucket out of range for '$t'")
      // lowering happens INSIDE the kernel: pre-lowered input is identical
      val low = TextKernels.charNgramFnvBuckets(
        UTF8String.fromString(t.toLowerCase(java.util.Locale.ROOT)), 2, 1024).toIntArray()
      assert(out.sameElements(low), s"case-sensitivity leaked for '$t'")
    }
    // shorter than n → no windows
    assert(TextKernels.charNgramFnvBuckets(UTF8String.fromString("a"), 2, 64)
      .numElements() == 0)
    assert(TextKernels.charNgramFnvBuckets(UTF8String.fromString(""), 2, 64)
      .numElements() == 0)
  }

  test("GenData plants linear-density near-duplicates deterministically") {
    val spark = TestSpark.session
    val docs = GenData.documents(spark, 700, seed = 42L)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // regeneration is bitwise-stable
    val again = GenData.documents(spark, 700, seed = 42L)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs == again)
    // every id ≡ 3 (mod 7) matches its leader verbatim or in all but ≤2
    // token positions (same length) — and its Jaccard stays ≥ ~0.9
    val dupIds = (3L until 700L by 7L)
    assert(dupIds.nonEmpty)
    dupIds.foreach { id =>
      val dup = docs(id).split(' '); val lead = docs(id - 3).split(' ')
      assert(dup.length == lead.length, s"dup $id length differs from leader")
      val diffs = dup.zip(lead).count { case (a, b) => a != b }
      assert(diffs <= 2, s"dup $id differs in $diffs positions")
      if (lead.length < 40) assert(diffs == 0, s"short leader ${id - 3} not copied verbatim")
    }
    // non-planted pairs collide at a rate FAR below the planted density
    // (short head-word-only docs can coincide — real corpora have those
    // too; the old 31-word generator collided at ~7% of ALL pairs)
    val bases = (0L until 700L).filterNot(i => i % 7 == 3).take(80)
    val basePairsHigh = bases.combinations(2).take(1000).count { case Seq(a, b) =>
      val ta = docs(a).split(' ').toSet; val tb = docs(b).split(' ').toSet
      ta.intersect(tb).size.toDouble / ta.union(tb).size >= 0.9
    }
    assert(basePairsHigh <= 5,
      s"$basePairsHigh/1000 random base pairs collide at J>=0.9 — quadratic mass is back")
  }

  test("simhash is permutation-invariant (vote sum over tokens)") {
    samples(Gen.listOfN(8, Gen.oneOf("aa", "bb", "cc", "dd")), 100).foreach { toks =>
      val rnd = new scala.util.Random(toks.hashCode)
      val h1 = TextKernels.simhash64(UTF8String.fromString(toks.mkString(" ")))
      val h2 = TextKernels.simhash64(UTF8String.fromString(rnd.shuffle(toks).mkString(" ")))
      assert(h1 == h2)
    }
  }

  test("filter compiler equals a direct in-memory evaluator on random filter trees") {
    val spark = TestSpark.session
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, s"cat${i % 4}", i % 7, if (i % 5 == 0) null else s"v${i % 3}")
    }
    val df = docs.toDF("id", "cat", "num", "opt").cache()

    case class F(json: String, pred: ((Long, String, Int, String)) => Boolean)
    val leaf: Gen[F] = Gen.oneOf(
      Gen.chooseNum(0, 6).map(v => F(s"""{"num": {"$$gt": $v}}""", r => r._3 > v)),
      Gen.chooseNum(0, 6).map(v => F(s"""{"num": {"$$lte": $v}}""", r => r._3 <= v)),
      Gen.oneOf("cat0", "cat1", "cat2", "cat3").map(v =>
        F(s"""{"cat": {"$$eq": "$v"}}""", r => r._2 == v)),
      Gen.oneOf("v0", "v1", "v2").map(v =>
        F(s"""{"opt": {"$$ne": "$v"}}""", r => r._4 == null || r._4 != v)),
      Gen.someOf(Seq(0, 1, 2, 3, 4, 5, 6)).suchThat(_.nonEmpty).map(vs =>
        F(s"""{"num": {"$$in": [${vs.mkString(",")}]}}""", r => vs.contains(r._3))))
    val node: Gen[F] = Gen.oneOf(
      leaf,
      Gen.zip(leaf, leaf).map { case (a, b) =>
        F(s"""{"$$and": [${a.json}, ${b.json}]}""", r => a.pred(r) && b.pred(r)) },
      Gen.zip(leaf, leaf).map { case (a, b) =>
        F(s"""{"$$or": [${a.json}, ${b.json}]}""", r => a.pred(r) || b.pred(r)) },
      leaf.map(a => F(s"""{"$$not": ${a.json}}""", r => !a.pred(r))))

    samples(node, 30).foreach { f =>
      val got = df.where(FilterCompiler.compile(f.json))
        .select("id").as[Long].collect().toSet
      val expected = docs.filter(f.pred).map(_._1).toSet
      assert(got == expected, s"filter ${f.json}")
    }
  }
}
