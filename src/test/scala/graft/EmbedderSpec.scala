package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Embedder, HashBackedClient, HashEmbedder, RemoteEmbedder}
import graft.store._

/** Second Embedder implementation behind the trait boundary — the
  * remote-endpoint batch contract (remote_embeddings.rs:1-197) served by a
  * deterministic local stand-in, proven vector-identical to the column
  * kernel and batch-shaped at ingest.
  */
class EmbedderSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val texts = Seq(
    "spark native analytics engine", "vector search over chunks",
    "deterministic hash projection", "remote endpoint batch contract",
    "", "one more row of text")

  test("RemoteEmbedder(HashBackedClient) is vector-identical to HashEmbedder") {
    val hash = HashEmbedder(64)
    val remote = RemoteEmbedder(HashBackedClient(64), dim = 64, batchSize = 2)
    val df = texts.toDF("t")
    val viaCol = df.select(hash.embedCol(col("t")).as("e")).as[Array[Float]].collect()
    val viaFrame = remote.embedFrame(df, col("t"), "e")
      .select("e").as[Array[Float]].collect()
    assert(viaCol.length == viaFrame.length)
    viaCol.zip(viaFrame).foreach { case (a, b) => assert(a.sameElements(b)) }
    // driver-side query path agrees too
    assert(hash.embedOne("query text").sameElements(remote.embedOne("query text")))
  }

  test("embedFrame groups rows into batchSize slices — one client call per slice") {
    // the client leaks its per-call batch size into element 0 of every
    // embedding, so the call pattern is visible in the output without
    // side-channel state: 10 rows in 1 partition at batchSize=4 → calls of
    // 4, 4, 2
    val remote = RemoteEmbedder(EmbedderSpec.ProbeClient(4), dim = 4, batchSize = 4)
    val df = (0 until 10).map(i => s"text $i").toDF("t").repartition(1)
    val sizes = remote.embedFrame(df, col("t"), "e")
      .select(element_at(col("e"), 1)).as[Float].collect().toSeq
    assert(sizes.count(_ == 4.0f) == 8 && sizes.count(_ == 2.0f) == 2,
      s"batch sizes seen: $sizes")
  }

  test("embedFrame: reserved/output column collisions are safe") {
    val remote = RemoteEmbedder(HashBackedClient(8), dim = 8, batchSize = 2)
    // a pre-existing __embed_in column survives untouched (unique temp name)
    val df = Seq(("a", 1), ("b", 2)).toDF("t", "__embed_in")
    val out = remote.embedFrame(df, col("t"), "e")
    assert(out.columns.toSeq == Seq("t", "__embed_in", "e"))
    assert(out.select("__embed_in").as[Int].collect().sorted.sameElements(Array(1, 2)))
    // an output name already present fails loudly instead of clobbering
    intercept[IllegalArgumentException] {
      remote.embedFrame(df, col("t"), "__embed_in")
    }
  }

  test("embedFrame: NULL text yields NULL embedding and never reaches the client") {
    val remote = RemoteEmbedder(EmbedderSpec.StrictClient(8), dim = 8, batchSize = 3)
    val df = Seq(Some("a"), None, Some("b"), None).toDF("t")
    val out = remote.embedFrame(df, col("t"), "e").select("t", "e").collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1)) else assert(!r.isNullAt(1))
    }
  }

  test("vector_search is embedder-agnostic: remote-backed pipeline matches hash pipeline") {
    def collectionWith(emb: Embedder, name: String): (Collection, Pipeline) = {
      val wh = Files.createTempDirectory("graft_wh_").toString
      val c = new Collection(spark, name, wh)
      val docs = (0 until 25).map { i =>
        s"""{"id": $i, "body": "document $i about ${Seq("spark", "vectors", "parquet")(i % 3)} processing"}"""
      }.toDF("document")
      c.upsertDocuments(docs)
      val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((64, 8)),
        semanticSearch = Some(emb))))
      c.syncPipeline(p)
      (c, p)
    }
    val (c1, p1) = collectionWith(HashEmbedder(64), "emb_hash")
    val (c2, p2) = collectionWith(RemoteEmbedder(HashBackedClient(64), 64, batchSize = 7), "emb_remote")
    def results(c: Collection, p: Pipeline) =
      c.vectorSearch(p, Seq(VectorSearchField("body", "spark processing")), limit = 5)
        .select("document_id", "chunk", "score").collect().toSeq
    assert(results(c1, p1) == results(c2, p2))
  }

  // ---- a genuinely TRAINED model through the same seam (no stand-in): fit
  // MLlib Word2Vec on the corpus, persist, serve — sync → index → search
  // end-to-end, plus the remote batch protocol over the same weights.

  test("trained Word2Vec model serves the full sync → index → search path") {
    import graft.functions.Word2VecEmbedder
    val wh = Files.createTempDirectory("graft_w2v_wh_").toString
    val topics = Seq("spark", "vectors", "parquet", "shuffle", "broadcast")
    val docs = (0 until 40).map { i =>
      s"""{"id": $i, "body": "document $i about ${topics(i % 5)} ${topics((i + 1) % 5)} processing"}"""
    }

    // fit on the corpus text itself, persist with MLlib's writer, reload —
    // the serving session never retrains
    val corpus = docs.toDF("document")
      .select(get_json_object(col("document"), "$.body").as("body"))
    val modelPath = s"$wh/w2v_model"
    Word2VecEmbedder.fitAndSave(corpus, "body", modelPath, dim = 16, minCount = 1)
    val emb = Word2VecEmbedder.load(spark, modelPath)
    assert(emb.dim == 16 && emb.vectors.nonEmpty)
    // learned vectors are unit-pooled per the contract
    val v = emb.embedOne("spark processing")
    assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5)

    val c = new Collection(spark, "w2v", wh)
    c.upsertDocuments(docs.toDF("document"))
    val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((100000, 0)),
      semanticSearch = Some(emb), hnswIndex = Some((8, 32)))))
    c.syncPipeline(p)

    // exact serving: the top hit for a document's own text is that document
    // (doc 7 = topics(7 % 5) + topics(8 % 5) = "parquet shuffle")
    val probe = """document 7 about parquet shuffle processing"""
    val top = c.vectorSearch(p, Seq(VectorSearchField("body", probe)), limit = 1)
      .select(get_json_object(col("document"), "$.id").cast("int").as("id"))
      .as[Int].head()
    assert(top == 7, s"expected doc 7 for its own text, got $top")
    // index-served path agrees
    val hTop = c.hnswSearch(p, "body", emb.embedOne(probe), 1, ef = 200)
      .select("document_id").as[String].head()
    val expect = c.documents
      .where(get_json_object(col("document"), "$.id") === "7")
      .select("source_uuid").as[String].head()
    assert(hTop == expect)

    // the incremental path embeds new documents with the same model
    c.upsertDocuments(Seq(
      """{"id": 99, "body": "fresh document about vectors parquet processing"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    assert(c.embeddings(p, "body").count() == 41)
    c.awaitMaintenance()
  }

  test("trained bi-encoder serves through the rank seam (rerank_score = trained cosine)") {
    import graft.functions.{BiEncoderReranker, Word2VecEmbedder}
    val wh = Files.createTempDirectory("graft_rr_wh_").toString
    val topics = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val docs = (0 until 25).map { i =>
      s"""{"id": $i, "body": "note $i topic ${topics(i % 5)} and ${topics((i + 2) % 5)}"}"""
    }
    val corpus = docs.toDF("document")
      .select(get_json_object(col("document"), "$.body").as("body"))
    val emb = Word2VecEmbedder.fit(corpus, "body", dim = 12, minCount = 1)

    val c = new Collection(spark, "rr", wh)
    c.upsertDocuments(docs.toDF("document"))
    val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((100000, 0)),
      semanticSearch = Some(emb))))
    c.syncPipeline(p)

    val probe = "note 3 topic delta and alpha"
    val ranked = c.vectorSearch(p, Seq(VectorSearchField("body", probe)),
      limit = 5, rerank = Some(15), reranker = BiEncoderReranker(emb))
    val rows = ranked.select(
        get_json_object(col("document"), "$.id").cast("int").as("id"),
        col("chunk"), col("rerank_score")).collect()
    // the trained cross-score of the top hit IS the trained cosine — the
    // seam serves the model's own numbers, not the token-overlap stand-in
    val top = rows.head
    val expected = {
      val qv = emb.embedOne(probe)
      val cv = emb.embedOne(top.getString(1))
      qv.zip(cv).map { case (a, b) => a.toDouble * b }.sum
    }
    assert(math.abs(top.getDouble(2) - expected) < 1e-6,
      s"rerank_score ${top.getDouble(2)} != trained cosine $expected")
    assert(top.getInt(0) == 3, s"expected doc 3 for its own text, got ${top.getInt(0)}")
    // ordering is by the trained score, descending
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    c.awaitMaintenance()
  }

  // ---- cross-encoder-shaped reranker (trained interaction model) ----

  // fixture: each doc = 4 unique key tokens + its THEME token repeated 8×
  // + shared fillers; the query carries the target's keys plus a WRONG
  // theme token. A bi-encoder's bag similarity is pulled toward the
  // wrong-theme docs (8× repetition dominates the vector); the
  // interaction features (coverage of the query's distinct tokens) are
  // not — exactly the failure mode cross-encoders exist to fix.
  private def ceDoc(d: Int): String =
    ((0 until 4).map(j => s"key${d}x$j") ++ Seq.fill(8)(s"theme${d % 5}") ++
      (0 until 8).map(i => s"common$i")).mkString(" ")
  private def ceQuery(d: Int): String =
    ((0 until 4).map(j => s"key${d}x$j") ++ Seq.fill(2)(s"theme${(d + 1) % 5}"))
      .mkString(" ")

  test("trained cross-encoder (interaction features) beats the bi-encoder on held-out relevance") {
    import graft.functions.{BiEncoderReranker, CrossEncoderReranker}
    val emb = HashEmbedder(64)
    // fit on docs 0..19; evaluate on UNSEEN docs 20..29. (d+6)%20 is the
    // HARD negative: its theme ≡ (d+1)%5 matches the query's wrong-theme
    // token — without it the fit never sees the distractor pattern and
    // learns repeated-token tf as relevance (the bi-encoder's own failure)
    val trainPairs = (0 until 20).flatMap { d =>
      Seq((ceQuery(d), ceDoc(d), 1.0),
        (ceQuery(d), ceDoc((d + 6) % 20), 0.0),
        (ceQuery(d), ceDoc((d + 7) % 20), 0.0))
    }.toDF("q", "c", "label")
    val model = CrossEncoderReranker.fit(trainPairs, "q", "c", "label", emb)
    val cross = CrossEncoderReranker(model)
    val bi = BiEncoderReranker(emb)
    val heldDocs = (20 until 30).map(d => (d.toLong, ceDoc(d))).toDF("doc_id", "chunk")
    def top1(rr: graft.functions.Reranker, d: Int): Long =
      heldDocs.select(col("doc_id"), rr.scoreCol(ceQuery(d), col("chunk")).as("s"))
        .orderBy(col("s").desc, col("doc_id")).head().getLong(0)
    val crossAcc = (20 until 30).count(d => top1(cross, d) == d.toLong) / 10.0
    val biAcc = (20 until 30).count(d => top1(bi, d) == d.toLong) / 10.0
    assert(crossAcc >= 0.9, s"cross-encoder held-out accuracy $crossAcc < 0.9")
    assert(crossAcc > biAcc,
      s"cross-encoder ($crossAcc) must beat the bi-encoder ($biAcc) on the distractor fixture")
    // scoring is pure map-side column work — no join, no shuffle in the plan
    val plan = heldDocs.select(cross.scoreCol("probe", col("chunk")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cross-encoder scoring shuffled:\n$plan")
  }

  test("cross-encoder serves through the rank seam with the corpus_id contract unchanged") {
    import graft.functions.CrossEncoderReranker
    val emb = HashEmbedder(64)
    val trainPairs = (0 until 20).flatMap { d =>
      Seq((ceQuery(d), ceDoc(d), 1.0),
        (ceQuery(d), ceDoc((d + 6) % 20), 0.0),
        (ceQuery(d), ceDoc((d + 7) % 20), 0.0))
    }.toDF("q", "c", "label")
    val cross = CrossEncoderReranker(
      CrossEncoderReranker.fit(trainPairs, "q", "c", "label", emb))

    val wh = Files.createTempDirectory("graft_ce_wh_").toString
    val docs = (0 until 25).map(i => s"""{"id": $i, "body": "${ceDoc(i)}"}""")
    val c = new Collection(spark, "ce", wh)
    c.upsertDocuments(docs.toDF("document"))
    val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((100000, 0)),
      semanticSearch = Some(emb))))
    c.syncPipeline(p)
    val probe = ceQuery(3)
    val ranked = c.vectorSearch(p, Seq(VectorSearchField("body", probe)),
      limit = 5, rerank = Some(15), reranker = cross)
    val rows = ranked.select(
      get_json_object(col("document"), "$.id").cast("int").as("id"),
      col("rerank_score")).collect()
    assert(rows.head.getInt(0) == 3,
      s"expected doc 3 for its own query, got ${rows.head.getInt(0)}")
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "rerank_score ordering broken")
    c.awaitMaintenance()
  }

  test("Word2Vec weights behind the remote batch protocol match the in-process embedder") {
    import graft.functions.{Word2VecBackedClient, Word2VecEmbedder}
    val corpus = (0 until 30).map(i => s"training sentence $i about spark vectors")
      .toDF("body")
    val emb = Word2VecEmbedder.fit(corpus, "body", dim = 12, minCount = 1)
    val remote = RemoteEmbedder(Word2VecBackedClient(emb), dim = 12, batchSize = 4)
    val df = Seq("spark vectors", "training sentence", "about spark").toDF("t")
    val direct = df.select(emb.embedCol(col("t")).as("e")).as[Array[Float]].collect()
    val viaRemote = remote.embedFrame(df, col("t"), "e")
      .select("e").as[Array[Float]].collect()
    assert(direct.zip(viaRemote).forall { case (a, b) => a.sameElements(b) })
    assert(remote.embedOne("spark vectors").sameElements(emb.embedOne("spark vectors")))
  }
}

object EmbedderSpec {
  // top-level so the task closure serializes the client alone, not the suite
  final case class ProbeClient(dim: Int) extends graft.functions.RemoteEmbeddingsClient {
    override def model = "probe"
    override def embedBatch(ts: Seq[String]): Seq[Array[Float]] =
      ts.map { _ => val a = new Array[Float](dim); a(0) = ts.length.toFloat; a }
  }
  final case class StrictClient(dim: Int) extends graft.functions.RemoteEmbeddingsClient {
    override def model = "strict"
    override def embedBatch(ts: Seq[String]): Seq[Array[Float]] = {
      require(ts.forall(_ != null), "client must not see NULLs")
      graft.functions.HashBackedClient(dim).embedBatch(ts)
    }
  }
}
