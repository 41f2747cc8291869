package graft.store

import org.apache.spark.sql.DataFrame

/** Deprecated fluent search façade over [[Collection.vectorSearch]] —
  * `collection.query().vector_recall(q, pipeline).limit(n).filter(f)`
  * (pgml-sdks/pgml/src/query_builder.rs:1-113).
  */
class QueryBuilder(collection: Collection) {
  private var recall: Option[(String, Pipeline)] = None
  private var limitN: Int = 10
  private var filterJson: Option[String] = None

  def vectorRecall(query: String, pipeline: Pipeline): QueryBuilder = {
    recall = Some((query, pipeline)); this
  }
  def limit(n: Int): QueryBuilder = { limitN = n; this }
  def filter(json: String): QueryBuilder = { filterJson = Some(json); this }

  def fetchAll(): DataFrame = {
    val (q, p) = recall.getOrElse(
      throw new IllegalStateException("vector_recall not set"))
    val field = p.fields.find(_.semanticSearch.isDefined).getOrElse(
      throw new IllegalStateException("pipeline has no semantic_search field"))
    collection.vectorSearch(p, Seq(VectorSearchField(field.name, q)), limitN, filterJson)
  }
}

/** OpenAI-compatible chat façade — `OpenSourceAI.chat_completions_create`
  * (open_source_ai.rs:140-420). Routed through the `conversational`
  * transform task exactly like the reference (it builds a conversational
  * TransformerPipeline, open_source_ai.rs:147-163, and wraps each returned
  * choice string in the chat-completion envelope, open_source_ai.rs:305-336).
  * `id`/`created` are wall-clock in the reference; here they derive from the
  * request so the envelope is deterministic and testable.
  */
object OpenSourceAI {

  // full JSON string escaping (all control chars) — same discipline as
  // Transform's envelopes
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def messagesJson(messages: Seq[(String, String)]): String =
    messages.map { case (role, content) =>
      s"""{"role": "${esc(role)}", "content": "${esc(content)}"}"""
    }.mkString("[", ", ", "]")

  def chatCompletionsCreate(
      model: String,
      messages: Seq[(String, String)], // (role, content)
      maxTokens: Int = 32): String = {
    graft.operators.Transform.checkAllowed(model)
    val msgs = messagesJson(messages)
    // the conversational task returns a JSON array of choice strings
    // (one per generation; transform.rs:35-46)
    val out = graft.operators.TaskModels.run("conversational", msgs,
      Map("max_tokens" -> maxTokens.toString, "model" -> model))
    val choices = org.json4s.jackson.JsonMethods.parse(out) match {
      case org.json4s.JArray(items) => items.collect { case org.json4s.JString(s) => s }
      case other => Seq(other.toString)
    }
    val choiceJson = choices.zipWithIndex.map { case (c, i) =>
      s"""{"index": $i, "message": {"role": "assistant", "content": "${esc(c)}"}}"""
    }.mkString("[", ", ", "]")
    // system_fingerprint = md5-of-parameters analogue (open_source_ai.rs:293-296)
    val fingerprint = java.lang.Long.toHexString(
      graft.functions.TextKernels.fnv1a64(s"$model$maxTokens"))
    val id = java.lang.Long.toHexString(graft.functions.TextKernels.fnv1a64(msgs))
    s"""{"id": "$id", "object": "chat.completion", "created": 0, "model": "$model",""" +
      s""" "choices": $choiceJson, "system_fingerprint": "$fingerprint"}"""
  }

  /** Streaming variant: per-token `chat.completion.chunk`-style deltas as a
    * driver iterator (open_source_ai.rs:188-247). */
  def chatCompletionsCreateStream(
      model: String, messages: Seq[(String, String)], maxTokens: Int = 32): Iterator[String] = {
    graft.operators.Transform.checkAllowed(model)
    graft.operators.Transform.transformStream(
      "conversational", messagesJson(messages), Map("max_tokens" -> maxTokens.toString))
  }
}
