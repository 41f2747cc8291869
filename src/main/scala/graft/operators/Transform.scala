package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.{HashEmbedder, TextKernels}
import graft.store.TsRank

/** A served model behind the transform dispatch — the boundary a real
  * accelerator-backed backend (or a model trained in-pipeline) plugs into.
  * Registered under a model name ([[Transform.registerModel]]); selecting
  * it via `args("model")` routes the whole batch through [[runBatch]].
  * Serializable: the DRIVER resolves the name and the model ships inside
  * the mapPartitions closure, so registration never has to exist on
  * executors (cluster-correct, unlike an executor-side registry lookup).
  */
trait TaskModel extends Serializable {
  def task: String
  /** One model call over a whole batch (the padded/stacked on-device
    * shape). MUST return exactly one output per input. */
  def runBatch(texts: Seq[String], args: Map[String, String]): Seq[String]
}

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

  /** The FULL `verify_task` config surface (whitelist.rs:9-51): three GUC
    * strings — the model whitelist CSV, the global trust_remote_code flag,
    * and the trusted-model CSV. Empty CSV = unrestricted (config_csv_list
    * drops empty segments, whitelist.rs:41-51). */
  final case class GuardConfig(
      whitelist: String = "",
      trustRemoteCode: Boolean = false,
      trustRemoteCodeWhitelist: String = "")
  @volatile var guardConfig: GuardConfig = GuardConfig()

  /** whitelist.rs:41-51 `config_csv_list`: strip surrounding quotes, split
    * on ',', drop empty segments. */
  def csvList(v: String): Seq[String] =
    v.replaceAll("^\"+|\"+$", "").split(',').toSeq.filter(_.nonEmpty)

  /** `verify_task` (whitelist.rs:11-39) as a decision function: None = the
    * task may run; Some(reason) = the deny reason. Rules, in reference
    * order: a task with no model name always passes; a non-empty whitelist
    * must contain the model exactly (no wildcarding in the reference);
    * a task requesting trust_remote_code=true passes only when the global
    * flag is set AND (the trusted CSV is empty OR contains the model). */
  def verifyTask(
      model: Option[String], taskTrust: Option[Boolean],
      cfg: GuardConfig): Option[String] =
    model match {
      case None => None
      case Some(m) =>
        val wl = csvList(cfg.whitelist)
        if (wl.nonEmpty && !wl.contains(m)) Some("not_whitelisted")
        else {
          val trusted = csvList(cfg.trustRemoteCodeWhitelist)
          val modelTrusted = trusted.isEmpty || trusted.contains(m)
          if (taskTrust.contains(true) && !(cfg.trustRemoteCode && modelTrusted))
            Some("remote_code_not_trusted")
          else None
        }
    }

  /** Relational decision surface over (model, trust_remote_code) rows —
    * each row goes through the SAME verifyTask the serving path enforces,
    * so the allow/deny table is the guard's actual behavior, oracle-able
    * row-by-row from the pinned config literal (x14). */
  def whitelistDecisions(
      df: DataFrame, modelCol: String, trustCol: String,
      cfg: GuardConfig): DataFrame = {
    val mIdx = df.schema.fieldIndex(modelCol)
    val tIdx = df.schema.fieldIndex(trustCol)
    val outSchema = df.schema
      .add("allowed", org.apache.spark.sql.types.BooleanType)
      .add("reason", StringType)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val m = if (r.isNullAt(mIdx)) None else Some(r.getString(mIdx))
        val tr = if (r.isNullAt(tIdx)) None else Some(r.getBoolean(tIdx))
        val denial = verifyTask(m, tr, cfg)
        Row.fromSeq(r.toSeq :+ denial.isEmpty :+ denial.getOrElse("ok"))
      }
    }(enc)
  }

  private val customModels =
    scala.collection.concurrent.TrieMap.empty[String, TaskModel]

  /** Register a served model under `name`; `args("model") = name` then
    * routes that task's batches through it (still allowlist-checked). */
  def registerModel(name: String, m: TaskModel): Unit = customModels.put(name, m)
  def unregisterModel(name: String): Unit = { customModels.remove(name); () }

  /** Driver-side resolution of `args("model")` → a registered backend (or
    * None → the deterministic stand-ins). Mismatched task fails loudly —
    * serving a sentiment model under summarization is never what the
    * caller meant. */
  private def resolveModel(task: String, args: Map[String, String]): Option[TaskModel] =
    args.get("model").flatMap(customModels.get).map { m =>
      require(m.task == task,
        s"model ${args("model")} serves task ${m.task}, not $task")
      m
    }

  def checkAllowed(model: String): Unit = modelAllowlist.foreach { wl =>
    if (!wl.contains(model))
      throw new IllegalArgumentException(s"model $model not in allowlist")
  }

  val supportedTasks: Set[String] = Set(
    "text-classification", "summarization", "translation", "fill-mask",
    "text-generation", "text2text-generation", "question-answering",
    "zero-shot-classification", "token-classification", "conversational")

  /** Apply a task over `inputCol`, producing JSON in `outputCol`. Batched
    * mapPartitions over Rows: inputs are grouped into `batchSize` slices and
    * each slice goes through ONE model call (`TaskModels.runBatch`) — the
    * shape an accelerator-backed model needs (the reference batches the same
    * way: `array_agg → one pgml.embed call`, queries.rs:217-231). The
    * executor-local model is instantiated once per partition (the
    * per-backend model cache pattern, model.rs:24); no per-row UDF.
    */
  def apply(
      df: DataFrame, task: String, inputCol: String, outputCol: String = "output",
      args: Map[String, String] = Map.empty, batchSize: Int = 64): DataFrame = {
    require(supportedTasks.contains(task), s"unsupported task $task")
    require(df.columns.contains(inputCol), s"missing input column $inputCol")
    args.get("model").foreach(checkAllowed)
    // the full verify_task gate: whitelist membership plus the
    // trust_remote_code axis from the task args (whitelist.rs:11-39)
    verifyTask(args.get("model"),
        args.get("trust_remote_code").map(_.toBoolean), guardConfig)
      .foreach { reason =>
        throw new IllegalArgumentException(
          s"model ${args.getOrElse("model", "")} denied: $reason") }
    val custom = resolveModel(task, args)
    val idx = df.schema.fieldIndex(inputCol)
    val outSchema = df.schema.add(outputCol, StringType)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val inputs = batch.map { r =>
          val v = r.get(idx)
          if (v == null) "" else v.toString
        }
        val outs = custom.map(_.runBatch(inputs, args))
          .getOrElse(TaskModels.runBatch(task, inputs, args))
        // a misaligned backend must fail loudly, not drop/shift rows
        // (lazyZip would silently truncate to the shorter side)
        require(outs.length == inputs.length,
          s"task model returned ${outs.length} outputs for ${inputs.length} inputs")
        batch.lazyZip(outs).map((r, o) => Row.fromSeq(r.toSeq :+ o))
      }
    }(enc)
  }

  /** Batch surface (`pgml.transform(inputs TEXT[])` / `embed_batch`): one
    * model call per `batchSize` inputs per partition — the shape a real
    * accelerator-backed model needs. */
  def transformBatch(
      inputs: Dataset[String], task: String,
      args: Map[String, String] = Map.empty, batchSize: Int = 64): Dataset[String] = {
    require(supportedTasks.contains(task), s"unsupported task $task")
    args.get("model").foreach(checkAllowed)
    val custom = resolveModel(task, args)
    import inputs.sparkSession.implicits._
    inputs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one call per batch: a real backend runs the whole batch on-device
        val outs = custom.map(_.runBatch(batch, args))
          .getOrElse(batch.map(TaskModels.run(task, _, args)))
        require(outs.length == batch.length,
          s"task model returned ${outs.length} outputs for ${batch.length} inputs")
        outs
      }
    }
  }

  /** `pgml.transform_stream` — token streaming is a driver-side iterator
    * (documented gap: per-token streaming is anti-Spark; the capability is
    * preserved as an Iterator over generated tokens).
    */
  def transformStream(task: String, input: String, args: Map[String, String] = Map.empty): Iterator[String] = {
    // conversational streams the decoded reply tokens, not the JSON envelope
    // (transform_stream_conversational_json, api.rs:790-824)
    if (task == "conversational") {
      val reply = TaskModels.conversationalReply(
        TaskModels.parseMessages(input),
        args.get("max_tokens").orElse(args.get("max_new_tokens")).map(_.toInt).getOrElse(12))
      reply.split("\\s+").iterator.filter(_.nonEmpty)
    } else {
      val full = TaskModels.run(task, input, args)
      full.split("\\s+").iterator
    }
  }
}

/** Deterministic per-task "models" producing the reference's JSON shapes. */
object TaskModels {

  // public: the trained-sentiment distillation (x5) uses the lexicon as its
  // weak-label source, and oracles replay it
  val positive = Set("good", "great", "love", "excellent", "best", "fast", "happy", "like")
  val negative = Set("bad", "terrible", "hate", "worst", "slow", "awful", "sad", "broken")

  // full JSON string escaping: every control char below 0x20 (not just
  // \n) — a raw control char makes the envelope invalid JSON and any
  // downstream from_json silently nulls the whole output
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** One "model call" over a whole batch — a real backend pads/stacks the
    * batch and runs it on-device in one pass; the stand-in maps. */
  def runBatch(task: String, texts: Seq[String], args: Map[String, String]): Seq[String] =
    texts.map(run(task, _, args))

  /** The default chat template (transformers.py:407-415
    * apply_chat_template): role-tagged turns plus a generation prompt. */
  def applyChatTemplate(messages: Seq[(String, String)]): String =
    messages.map { case (role, content) => s"<|$role|>\n$content" }
      .mkString("\n") + "\n<|assistant|>\n"

  /** The conversational "generation": a deterministic reply derived from
    * the last non-assistant turn (the reference decodes only the NEW tokens
    * after the templated prompt, transformers.py:407-424 `outputs[:,
    * input_ids.shape[1]:]`) — here the first `max_tokens` tokens of that
    * turn, so the decision rule stays SQL-replayable for the oracle.
    */
  def conversationalReply(messages: Seq[(String, String)], maxTokens: Int): String = {
    val lastUser = messages.reverse.collectFirst {
      case (role, content) if role != "assistant" => content
    }.getOrElse("")
    TextKernels.tokens(lastUser).take(maxTokens).mkString(" ")
  }

  private def maxTokensArg(args: Map[String, String], dft: Int): Int =
    args.get("max_tokens").orElse(args.get("max_new_tokens")).map(_.toInt).getOrElse(dft)

  /** Parse a JSONB message array `[{"role": …, "content": …}, …]` (the
    * transform_conversational_json input contract, api.rs:713-730). */
  def parseMessages(json: String): Seq[(String, String)] = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    org.json4s.jackson.JsonMethods.parse(json) match {
      case JArray(items) => items.map { m =>
        ((m \ "role").extractOrElse[String]("user"),
          (m \ "content").extractOrElse[String](""))
      }
      case _ => Seq(("user", json))
    }
  }

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

    case "text2text-generation" =>
      // seq2seq stand-in (golden shape api.rs:1532-1547: a bare
      // `[{"generated_text": …}]` with NO echo of the input — unlike causal
      // text-generation): the instruction clause up to the first ':' is
      // consumed and the conditioned payload is "generated"
      val i = text.indexOf(':')
      val generated = if (i >= 0) text.substring(i + 1).trim else text.trim
      s"""[{"generated_text": "${esc(generated)}"}]"""

    case "conversational" =>
      // input = one conversation as a JSONB message array (the dedicated
      // transform overloads, api.rs:713-751); output = the decoded NEW
      // tokens only, a JSON array of reply strings (transform.rs:35-46
      // Vec<String> → JSON; transformers.py:420-424)
      val messages = parseMessages(text)
      val reply = conversationalReply(messages, maxTokensArg(args, 12))
      s"""["${esc(reply)}"]"""

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

/** Sentiment served from a TRAINED [[QualityClassifier.Model]] through the
  * transform dispatch — a real in-pipeline-trained MLlib model behind
  * `pgml.transform('text-classification', model := ...)` (api.rs:670-751
  * task dispatch; the HF pipeline's `[{"label", "score"}]` envelope with
  * the winning-class probability). The score string is the raw double
  * (`Double.toString` round-trips), so downstream rounding is the
  * consumer's choice — and the x5 oracle can replay the probability
  * IEEE-identically.
  */
final case class TrainedSentimentModel(model: QualityClassifier.Model)
    extends TaskModel {
  override def task: String = "text-classification"
  override def runBatch(texts: Seq[String], args: Map[String, String]): Seq[String] =
    texts.map { t =>
      val p = model.scoreOne(t)
      val (label, score) = if (p >= 0.5) ("POSITIVE", p) else ("NEGATIVE", 1.0 - p)
      s"""[{"label": "$label", "score": $score}]"""
    }
}
