package graft.store

import org.apache.spark.sql.Column
import org.json4s._
import org.json4s.jackson.JsonMethods

/** order_by over document paths — order_by_builder.rs:46-68:
  * `{"a": "desc"}` or `{"a": {"b": "asc"}}` → `doc#>'{a,b}' ASC/DESC NULLS
  * LAST`. Compiled to Column sorts with the same NULLS LAST default.
  */
object OrderByCompiler {

  def compile(json: String, resolve: FilterCompiler.Resolver): Seq[Column] =
    JsonMethods.parse(json) match {
      case JObject(fields) => fields.map { case (k, v) => one(Seq(k), v, resolve) }
      case other => throw new IllegalArgumentException(s"order_by must be an object, got $other")
    }

  private def one(path: Seq[String], v: JValue, resolve: FilterCompiler.Resolver): Column =
    v match {
      case JString(dir) =>
        val c = resolve(path)
        dir.toLowerCase match {
          case "asc" => c.asc_nulls_last
          case "desc" => c.desc_nulls_last
          case other => throw new IllegalArgumentException(s"invalid sort direction $other")
        }
      case JObject(inner) if inner.size == 1 =>
        one(path :+ inner.head._1, inner.head._2, resolve)
      case other => throw new IllegalArgumentException(s"invalid order_by value $other")
    }
}
