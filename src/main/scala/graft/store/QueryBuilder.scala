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

/** OpenAI-compatible chat façade over the generation operator —
  * `OpenSourceAI.chat_completions_create` (open_source_ai.rs:140-420).
  * Applies a simple chat template and returns the chat-completion shape.
  */
object OpenSourceAI {
  def chatCompletionsCreate(
      model: String,
      messages: Seq[(String, String)], // (role, content)
      maxTokens: Int = 32): String = {
    graft.operators.Transform.checkAllowed(model)
    val prompt = messages.map { case (role, content) => s"<|$role|>\n$content" }
      .mkString("\n") + "\n<|assistant|>\n"
    val gen = graft.operators.TaskModels.run("text-generation", prompt,
      Map("max_new_tokens" -> maxTokens.toString))
    val content = org.json4s.jackson.JsonMethods.parse(gen) \\ "generated_text" match {
      case org.json4s.JString(s) => s.stripPrefix(prompt)
      case other => other.toString
    }
    val esc = content.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    s"""{"choices": [{"index": 0, "message": {"role": "assistant", "content": "$esc"}}], "model": "$model"}"""
  }

  /** Streaming variant: token iterator (rag_stream analogue). */
  def chatCompletionsCreateStream(
      model: String, messages: Seq[(String, String)], maxTokens: Int = 32): Iterator[String] = {
    val full = chatCompletionsCreate(model, messages, maxTokens)
    val content = org.json4s.jackson.JsonMethods.parse(full) \\ "content" match {
      case org.json4s.JString(s) => s
      case other => other.toString
    }
    content.split(" ").iterator
  }
}
