package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Transform}

class TransformMultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("transform task dispatch returns reference JSON shapes") {
    val df = Seq(
      ("i love this fast great engine", 1L),
      ("terrible slow broken awful thing", 2L)
    ).toDF("text", "id")
    val cls = Transform(df, "text-classification", "text")
      .select(get_json_object(col("output"), "$[0].label").as("l")).as[String].collect()
    assert(cls.toSeq == Seq("POSITIVE", "NEGATIVE"))

    val sum = Transform(Seq(("One. Two. Three. Four.", 1)).toDF("text", "id"),
      "summarization", "text")
      .select(get_json_object(col("output"), "$[0].summary_text")).as[String].head()
    assert(sum == "One. Two.")

    val qa = Transform(Seq(("Spark is fast. DuckDB is embedded.", 1)).toDF("text", "id"),
      "question-answering", "text", args = Map("question" -> "what is embedded?"))
      .select(get_json_object(col("output"), "$.answer")).as[String].head()
    assert(qa == "DuckDB is embedded.")

    // determinism: same input → same output
    val g1 = Transform(df, "text-generation", "text").select("output").as[String].collect()
    val g2 = Transform(df, "text-generation", "text").select("output").as[String].collect()
    assert(g1.toSeq == g2.toSeq)
  }

  test("text2text-generation returns bare generated_text with no input echo") {
    // golden shape api.rs:1532-1547: [{"generated_text": "Je suis très heureux"}]
    val out = Transform(
      Seq(("translate from English to French: I'm very happy", 1)).toDF("text", "id"),
      "text2text-generation", "text")
      .select(get_json_object(col("output"), "$[0].generated_text")).as[String].head()
    assert(out == "I'm very happy")
    // no instruction clause → pass-through
    val plain = graft.operators.TaskModels.run("text2text-generation", "just text", Map.empty)
    assert(plain == """[{"generated_text": "just text"}]""")
  }

  test("conversational consumes JSONB message arrays and returns reply-string arrays") {
    // input contract api.rs:713-730 (ARRAY[]::JSONB message objects);
    // output = decoded NEW tokens only, as a JSON array of strings
    val msgs = """[{"role": "system", "content": "be terse"},
                   {"role": "user", "content": "Tell Me About Spark Joins"}]"""
    val out = graft.operators.TaskModels.run("conversational", msgs, Map("max_tokens" -> "3"))
    assert(out == """["tell me about"]""")
    // the reply derives from the last non-assistant turn
    val withReply = """[{"role": "user", "content": "first question"},
                        {"role": "assistant", "content": "an answer"},
                        {"role": "user", "content": "second question here"}]"""
    val out2 = graft.operators.TaskModels.run("conversational", withReply, Map.empty)
    assert(out2 == """["second question here"]""")
    // DataFrame surface dispatches it too
    val df = Seq((msgs, 1L)).toDF("messages", "id")
    val viaDf = Transform(df, "conversational", "messages", args = Map("max_tokens" -> "3"))
      .select(get_json_object(col("output"), "$[0]")).as[String].head()
    assert(viaDf == "tell me about")
  }

  test("conversational transform_stream yields reply tokens") {
    val msgs = """[{"role": "user", "content": "alpha beta gamma delta"}]"""
    val toks = Transform.transformStream("conversational", msgs).toList
    assert(toks == List("alpha", "beta", "gamma", "delta"))
  }

  test("OpenSourceAI chat routes through the conversational task") {
    val res = graft.store.OpenSourceAI.chatCompletionsCreate(
      "test-model", Seq(("system", "be terse"), ("user", "Explain Shuffle Partitions Now")),
      maxTokens = 2)
    val parsed = org.json4s.jackson.JsonMethods.parse(res)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    assert((parsed \ "object").extract[String] == "chat.completion")
    assert((parsed \ "model").extract[String] == "test-model")
    val content = (parsed \ "choices")(0) \ "message" \ "content"
    // the conversational generation rule, not a text-generation echo
    assert(content.extract[String] == "explain shuffle")
    assert(((parsed \ "choices")(0) \ "message" \ "role").extract[String] == "assistant")
    // deterministic envelope (derived ids, not wall-clock)
    assert(graft.store.OpenSourceAI.chatCompletionsCreate(
      "test-model", Seq(("system", "be terse"), ("user", "Explain Shuffle Partitions Now")),
      maxTokens = 2) == res)
    // streaming variant yields the reply tokens as deltas
    val stream = graft.store.OpenSourceAI.chatCompletionsCreateStream(
      "test-model", Seq(("user", "one two three")), maxTokens = 2).toList
    assert(stream == List("one", "two"))
  }

  test("trained model serves through the transform dispatch registry") {
    import graft.operators.{QualityClassifier, TrainedSentimentModel, Transform}
    val pos = (1 to 40).map(i => (i, s"great fast excellent work item $i love it")).toDF("id", "text")
    val neg = (1 to 40).map(i => (i, s"terrible slow broken mess item $i hate it")).toDF("id", "text")
    val m = QualityClassifier.fit(pos, neg, "text", dim = 256)
    Transform.registerModel("test-sentiment", TrainedSentimentModel(m))
    try {
      val out = Transform(
          Seq((1, "fast excellent love"), (2, "slow broken hate")).toDF("id", "text"),
          "text-classification", "text", args = Map("model" -> "test-sentiment"))
        .select(col("id"),
          get_json_object(col("output"), "$[0].label").as("label"),
          get_json_object(col("output"), "$[0].score").cast("double").as("score"))
        .orderBy("id").collect()
      assert(out(0).getString(1) == "POSITIVE" && out(1).getString(1) == "NEGATIVE")
      // the served score IS the trained model's own probability
      val p1 = m.scoreOne("fast excellent love")
      assert(out(0).getDouble(2) == p1)
      val p2 = m.scoreOne("slow broken hate")
      assert(out(1).getDouble(2) == 1.0 - p2)
      assert(out.forall(_.getDouble(2) > 0.5))
      // without args(model) the deterministic stand-in still serves
      val dft = Transform(Seq((1, "good")).toDF("id", "text"),
          "text-classification", "text")
        .select(get_json_object(col("output"), "$[0].score").cast("double"))
        .head().getDouble(0)
      assert(dft == 1.0) // lexicon stand-in: pos/(pos+neg)
      // a registered model cannot serve a different task
      val e = intercept[IllegalArgumentException] {
        Transform(Seq((1, "x")).toDF("id", "text"), "summarization", "text",
          args = Map("model" -> "test-sentiment"))
      }
      assert(e.getMessage.contains("serves task text-classification"))
      // a backend returning the wrong output count fails loudly, never
      // silently truncating or shifting rows
      object Misaligned extends graft.operators.TaskModel {
        override def task: String = "text-classification"
        override def runBatch(texts: Seq[String], args: Map[String, String]) =
          texts.drop(1).map(_ => """[{"label": "POSITIVE", "score": 1.0}]""")
      }
      Transform.registerModel("misaligned", Misaligned)
      try {
        val e2 = intercept[org.apache.spark.SparkException] {
          Transform(Seq((1, "a"), (2, "b")).toDF("id", "text"),
            "text-classification", "text", args = Map("model" -> "misaligned"))
            .collect()
        }
        assert(e2.getMessage.contains("outputs for") ||
          Option(e2.getCause).exists(_.getMessage.contains("outputs for")))
      } finally Transform.unregisterModel("misaligned")
      // the allowlist still gates registered names
      Transform.modelAllowlist = Some(Set("other-model"))
      try intercept[IllegalArgumentException] {
        Transform(Seq((1, "x")).toDF("id", "text"), "text-classification",
          "text", args = Map("model" -> "test-sentiment"))
      } finally Transform.modelAllowlist = None
    } finally Transform.unregisterModel("test-sentiment")
  }

  test("allowlist guard blocks unlisted models") {
    Transform.modelAllowlist = Some(Set("allowed-model"))
    try {
      intercept[IllegalArgumentException] {
        Transform(Seq(("x", 1)).toDF("text", "id"), "summarization", "text",
          args = Map("model" -> "forbidden-model"))
      }
      // allowed model passes
      Transform(Seq(("x", 1)).toDF("text", "id"), "summarization", "text",
        args = Map("model" -> "allowed-model")).collect()
    } finally Transform.modelAllowlist = None
  }

  test("verifyTask replays whitelist.rs semantics (the reference's pg_tests)") {
    import Transform.{GuardConfig, verifyTask}
    val m = "Salesforce/xgen-7b-8k-inst"
    // test_empty_whitelist: empty CSV = unrestricted
    assert(verifyTask(Some(m), Some(false), GuardConfig("")).isEmpty)
    // test_nonempty_whitelist: exact membership required
    assert(verifyTask(Some(m), Some(false), GuardConfig(m)).isEmpty)
    assert(verifyTask(Some(m), Some(false), GuardConfig("other_model"))
      .contains("not_whitelisted"))
    // no model name in the task → always ok
    assert(verifyTask(None, Some(true), GuardConfig("other_model")).isEmpty)
    // test_trusted_model: global flag gates remote code even for a trusted
    // model; once set, both trust values pass
    val trusted = GuardConfig(m, trustRemoteCode = false, trustRemoteCodeWhitelist = m)
    assert(verifyTask(Some(m), Some(false), trusted).isEmpty)
    assert(verifyTask(Some(m), Some(true), trusted)
      .contains("remote_code_not_trusted"))
    val trustedOn = trusted.copy(trustRemoteCode = true)
    assert(verifyTask(Some(m), Some(false), trustedOn).isEmpty)
    assert(verifyTask(Some(m), Some(true), trustedOn).isEmpty)
    // test_untrusted_model: global ON but model not in the trusted CSV
    val untrusted = GuardConfig(m, trustRemoteCode = true,
      trustRemoteCodeWhitelist = "other_model")
    assert(verifyTask(Some(m), Some(false), untrusted).isEmpty)
    assert(verifyTask(Some(m), Some(true), untrusted)
      .contains("remote_code_not_trusted"))
    // config_csv_list: surrounding quotes stripped, empty segments dropped
    assert(Transform.csvList("\"a,b\"") == Seq("a", "b"))
    assert(Transform.csvList(",a,,b,") == Seq("a", "b"))
    assert(Transform.csvList("") == Nil)
    // the serving path enforces the trust axis end-to-end
    Transform.guardConfig = GuardConfig(whitelist = "", trustRemoteCode = false)
    try intercept[IllegalArgumentException] {
      Transform(Seq(("x", 1)).toDF("text", "id"), "summarization", "text",
        args = Map("model" -> "any", "trust_remote_code" -> "true"))
    } finally Transform.guardConfig = GuardConfig()
  }

  test("transformBatch batches per partition") {
    val out = Transform.transformBatch(
      spark.range(0, 10).map(i => s"item $i text"), "summarization", batchSize = 3)
    assert(out.count() == 10)
  }

  test("transform_stream yields tokens incrementally") {
    val it = Transform.transformStream("text-generation", "hello world engine")
    val toks = it.toList
    assert(toks.nonEmpty && toks.head.startsWith("[{"))
  }

  test("multimodal: batched feature extraction, frame sampling, resize planning") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents").limit(30)
    val media = Multimodal.syntheticMedia(spark, docs)
    val codec = new Multimodal.StubCodec(dim = 16)

    val feats = Multimodal.extractFeatures(media, codec, batchSize = 8)
    assert(feats.count() == 30)
    assert(feats.head().features.length == 16)
    // deterministic across runs
    val f1 = feats.orderBy("media_id").collect().map(_.features.toSeq)
    val f2 = Multimodal.extractFeatures(media, codec, batchSize = 8)
      .orderBy("media_id").collect().map(_.features.toSeq)
    assert(f1.toSeq == f2.toSeq)

    val frames = Multimodal.sampleFrames(media, codec, framesPerVideo = 4)
    assert(frames.count() > 0)
    assert(frames.groupBy("media_id").count().select(max("count")).as[Long].head() <= 4)

    val resized = Multimodal.planResize(media.toDF(), 64, 64)
    val bad = resized.where(col("dst_w") > 64 || col("dst_h") > 64).count()
    assert(bad == 0)
    // aspect ratio preserved within integer floor
    val r = resized.where(col("src_w") > 64).head()
    assert(r.getAs[Int]("dst_w") == 64 ||  r.getAs[Int]("dst_h") == 64)
  }

  test("multimodal: ImageIoCodec decodes real PNG bytes to exact pixel stats") {
    import graft.functions.TextKernels
    val ids = Seq(3L, 7L, 41L).map(java.lang.Long.valueOf).toDS()
    val media = Multimodal.syntheticPngMedia(ids, w = 8, h = 8)
    val feats = Multimodal.extractFeatures(media, new Multimodal.ImageIoCodec())
      .collect().map(f => f.media_id -> f.features).toMap
    for (id <- Seq(3L, 7L, 41L)) {
      // recompute the channel sums straight from the pixel recurrence —
      // matching through the PNG encode/decode roundtrip proves the codec
      // reproduced every pixel, not just plausible statistics
      val expect = (0 until 3).map { c =>
        (for (y <- 0 until 8; x <- 0 until 8)
          yield (TextKernels.mix(id, ((c * 8 + y) * 8 + x).toLong) & 0xff)).sum
      }
      val f = feats(id)
      assert(f(0) == 8f && f(1) == 8f)
      assert(Seq(f(2).toLong, f(3).toLong, f(4).toLong) == expect.map(_.toLong))
    }
    // a non-image kind flows through the stub fallback untouched
    val mixed = Multimodal.syntheticMedia(spark,
      Tables.load(spark, TestSpark.sf0001, "documents").limit(9))
    val viaReal = Multimodal.extractFeatures(mixed, new Multimodal.ImageIoCodec())
      .filter(_.kind != "image").orderBy("media_id").collect().map(_.features.toSeq)
    val viaStub = Multimodal.extractFeatures(mixed, new Multimodal.StubCodec(16))
      .filter(_.kind != "image").orderBy("media_id").collect().map(_.features.toSeq)
    assert(viaReal.toSeq == viaStub.toSeq)
  }

  test("multimodal: AudioWavCodec decodes real RIFF/PCM16 bytes to exact sample stats") {
    import graft.functions.TextKernels
    val ids = Seq(3L, 7L, 41L).map(java.lang.Long.valueOf).toDS()
    val media = Multimodal.syntheticWavMedia(ids, nSamples = 256)
    val feats = Multimodal.extractFeatures(media, new Multimodal.AudioWavCodec())
      .collect().map(f => f.media_id -> f.features).toMap
    for (id <- Seq(3L, 7L, 41L)) {
      // recompute the stats straight from the sample recurrence — a match
      // through the hand-assembled RIFF container and the JDK's
      // javax.sound decode proves every 16-bit sample survived, not just
      // plausible statistics
      val samples = (0 until 256).map(i =>
        ((TextKernels.mix(id, i.toLong) & 0xffffL) - 32768L).toInt)
      val zcr = samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      val f = feats(id)
      assert(f(0) == 256f && f(1) == 16000f)
      assert(f(2) == (samples.map(_.toLong).sum.toDouble / 256).toFloat)
      assert(f(3) == math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / 256).toFloat)
      assert(f(4).toLong == zcr.toLong)
    }
    // a non-audio kind flows through the stub fallback untouched
    val mixed = Multimodal.syntheticMedia(spark,
      Tables.load(spark, TestSpark.sf0001, "documents").limit(9))
    val viaReal = Multimodal.extractFeatures(mixed, new Multimodal.AudioWavCodec())
      .filter(_.kind != "audio").orderBy("media_id").collect().map(_.features.toSeq)
    val viaStub = Multimodal.extractFeatures(mixed, new Multimodal.StubCodec(16))
      .filter(_.kind != "audio").orderBy("media_id").collect().map(_.features.toSeq)
    assert(viaReal.toSeq == viaStub.toSeq)
  }

  test("multimodal: GifVideoCodec extracts real animated-GIF frames, pixel-exact") {
    import graft.functions.TextKernels
    val ids = Seq(3L, 41L).map(java.lang.Long.valueOf).toDS()
    val media = Multimodal.syntheticGifMedia(ids, frames = 6, w = 8, h = 8)
    val all = Multimodal.sampleFrames(media, new Multimodal.GifVideoCodec(), framesPerVideo = 6)
      .collect().map(f => (f.media_id, f.frame_index) -> f.frame_bytes).toMap
    assert(all.size == 12)
    for (id <- Seq(3L, 41L); f <- 0 until 6) {
      // every sampled frame decodes (as the PNG re-encode) to exactly the
      // gray recurrence it was synthesized from — the animated container
      // survived write → frame-seek → read bit-for-bit
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(all((id, f))))
      for (y <- 0 until 8; x <- 0 until 8) {
        val expect = (TextKernels.mix(id, ((f * 8 + y) * 8 + x).toLong) & 0xff).toInt
        assert((img.getRGB(x, y) & 0xff) == expect, s"id=$id f=$f ($x,$y)")
      }
    }
    // n < total picks evenly-spaced REAL frames (0, 2, 4 of 6)
    val sampled = Multimodal.sampleFrames(media, new Multimodal.GifVideoCodec(), framesPerVideo = 3)
      .filter(_.media_id == 3L).collect().sortBy(_.frame_index)
    assert(sampled.length == 3)
    val img1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(sampled(1).frame_bytes))
    assert((img1.getRGB(0, 0) & 0xff) ==
      (TextKernels.mix(3L, (2 * 8 * 8).toLong) & 0xff).toInt)
    // junk "video" bytes fall back to the stub slicer
    val junk = Seq(Multimodal.MediaRow(9L, "video", Array[Byte](1, 2, 3, 4),
      Multimodal.MediaMeta(0, 0, "mp4", 0L))).toDS()
    val fb = Multimodal.sampleFrames(junk, new Multimodal.GifVideoCodec(), framesPerVideo = 2)
      .collect()
    assert(fb.length == 2 && fb.forall(_.frame_bytes.nonEmpty))
  }

  test("multimodal: resizeImages really downsamples pixels (floor nearest-neighbor)") {
    import graft.functions.TextKernels
    val ids = Seq(3L, 41L).map(java.lang.Long.valueOf).toDS()
    val media = Multimodal.syntheticPngMedia(ids, w = 8, h = 8)
    val out = Multimodal.resizeImages(media, 4, 4).collect()
      .map(r => r.media_id -> r).toMap
    for (id <- Seq(3L, 41L)) {
      val r = out(id)
      assert(r.meta.width == 4 && r.meta.height == 4)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
      assert(img.getWidth == 4 && img.getHeight == 4)
      // dest (x,y) must be EXACTLY source (2x, 2y) of the recurrence
      for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
        val expect = (TextKernels.mix(id, ((c * 8 + 2 * y) * 8 + 2 * x).toLong) & 0xff).toInt
        val got = (img.getRGB(x, y) >> (16 - 8 * c)) & 0xff
        assert(got == expect, s"id=$id ($x,$y) c=$c")
      }
    }
    // already inside the box, non-image kinds, junk bytes: all passthrough
    val small = Multimodal.resizeImages(media, 16, 16).collect().head
    assert(small.meta.format == "png" && small.meta.width == 8)
    val junk = Seq(Multimodal.MediaRow(9L, "audio", Array[Byte](1, 2),
      Multimodal.MediaMeta(0, 0, "wav", 0L))).toDS()
    assert(Multimodal.resizeImages(junk, 4, 4).collect().head.bytes.length == 2)
  }
}
