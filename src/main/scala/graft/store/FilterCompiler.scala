package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** MongoDB-style metadata-filter compiler — the Spark counterpart of the
  * reference's JSONB filter builder (pgml-sdks/pgml/src/filter_builder.rs:
  * 18-163; semantics pinned by its unit tests at 224-405):
  *
  *   {"k": v} / {"k": {"$eq": v}}        equality
  *   {"$ne": v}                           inequality (null-safe: NULL ≠ v)
  *   {"$gt" | "$gte" | "$lt" | "$lte": v} ordered comparison
  *   {"$in": [..]} / {"$nin": [..]}       membership
  *   {"$and": [..]} / {"$or": [..]} / {"$not": f}   combinators
  *   nested keys ({"a": {"b": {"$eq": 1}}}) → path a.b
  *
  * Instead of emitting SQL text against JSONB operators, we compile to
  * `Column` expressions over a caller-supplied field resolver, so the same
  * filter JSON works against top-level columns, nested structs, or JSON
  * string columns — and Catalyst pushes the resulting predicates into the
  * parquet scan (strictly better than the reference's GIN-indexed `@>`,
  * SURVEY.md §4.1).
  */
object FilterCompiler {

  /** Resolve a dotted path to a field Column. `typed` tells the compiler
    * whether the resolved columns carry their real types (struct/top-level
    * columns — leave them uncast so Catalyst's cast-unwrapping keeps the
    * predicate pushable into the scan) or are string extracts that need an
    * explicit cast chosen from the literal.
    */
  trait Resolver extends (Seq[String] => Column) {
    def typed: Boolean = true
  }

  val columnResolver: Resolver = (path: Seq[String]) => col(path.mkString("."))

  /** Resolver for a JSON-string document column: extracts with
    * get_json_object (returns string; compile() casts by literal type —
    * there is no scan pushdown through get_json_object to preserve). */
  def jsonStringResolver(docCol: Column): Resolver = new Resolver {
    override def apply(path: Seq[String]): Column =
      get_json_object(docCol, "$." + path.mkString("."))
    override def typed: Boolean = false
  }

  def compile(filterJson: String, resolve: Resolver = columnResolver): Column =
    compileNode(JsonMethods.parse(filterJson), resolve)

  private def compileNode(node: JValue, resolve: Resolver): Column = node match {
    case JObject(fields) =>
      fields.map { case (k, v) => compileField(k, v, Nil, resolve) }
        .reduceOption(_ && _).getOrElse(lit(true))
    case other =>
      throw new IllegalArgumentException(s"filter root must be an object, got $other")
  }

  private def compileField(key: String, value: JValue, path: Seq[String], resolve: Resolver): Column =
    key match {
      case "$and" => value match {
        case JArray(items) => items.map(compileNode(_, resolve)).reduce(_ && _)
        case _ => throw new IllegalArgumentException("$and expects an array")
      }
      case "$or" => value match {
        case JArray(items) => items.map(compileNode(_, resolve)).reduce(_ || _)
        case _ => throw new IllegalArgumentException("$or expects an array")
      }
      case "$not" => !compileNode(value, resolve)
      case _ => compileValue(path :+ key, value, resolve)
    }

  private def compileValue(path: Seq[String], value: JValue, resolve: Resolver): Column =
    value match {
      case JObject(fields) if fields.nonEmpty && fields.forall(_._1.startsWith("$")) =>
        fields.map { case (op, v) => compileOp(path, op, v, resolve) }.reduce(_ && _)
      case JObject(fields) => // nested key path
        fields.map { case (k, v) => compileField(k, v, path, resolve) }
          .reduceOption(_ && _).getOrElse(lit(true))
      case v => compileOp(path, "$eq", v, resolve)
    }

  private def compileOp(path: Seq[String], op: String, v: JValue, resolve: Resolver): Column = {
    val field = resolve(path)
    def typed = if (resolve.typed) field else castTo(field, v)
    op match {
      case "$eq" => typed === literal(v)
      case "$ne" =>
        // reference semantics: NOT(x = v) via JSONB containment negation —
        // a missing/NULL field *does* satisfy $ne (it doesn't contain v)
        !(typed <=> literal(v))
      case "$gt" => typed > literal(v)
      case "$gte" => typed >= literal(v)
      case "$lt" => typed < literal(v)
      case "$lte" => typed <= literal(v)
      case "$in" => v match {
        case JArray(Nil) => lit(false) // x IN () matches nothing
        case JArray(items) =>
          val (f, vals) =
            if (resolve.typed) (field, items.map(scalaValue))
            else castForSet(field, items)
          f.isin(vals: _*)
        case _ => throw new IllegalArgumentException("$in expects an array")
      }
      case "$nin" => v match {
        case JArray(Nil) => lit(true) // x NOT IN () matches everything
        case JArray(items) =>
          val (f, vals) =
            if (resolve.typed) (field, items.map(scalaValue))
            else castForSet(field, items)
          !f.isin(vals: _*) || f.isNull
        case _ => throw new IllegalArgumentException("$nin expects an array")
      }
      case other => throw new IllegalArgumentException(s"unsupported filter operator $other")
    }
  }

  /** Cast an extracted field to the JSON literal's type (needed for the
    * JSON-string resolver where everything extracts as string). This path
    * only serves the json-string resolver — there is no scan pushdown to
    * preserve — so integral literals compare as decimal(38,18)
    * unconditionally: 64-bit ids stay exact (a double-cast would round
    * 2^53+1 onto 2^53 and falsely match), and fractional field values
    * compare exactly to 18 fractional digits (documented trade-off). */
  private def castTo(field: Column, v: JValue): Column = v match {
    case _: JInt | _: JLong => field.cast("decimal(38,18)")
    case _: JDouble | _: JDecimal => field.cast("double")
    case _: JBool => field.cast("boolean")
    case _ => field
  }

  /** For $in/$nin the cast must suit EVERY item — and the item literals
    * must match it, or Spark's In type coercion widens decimal+double back
    * to double and re-rounds big ids. Any integral member ⇒ the whole set
    * compares in decimal(38,18), with every numeric item converted to
    * BigDecimal end to end. */
  private def castForSet(field: Column, items: List[JValue]): (Column, Seq[Any]) = {
    val anyIntegral = items.exists {
      case _: JInt | _: JLong => true
      case _ => false
    }
    if (anyIntegral) {
      val vals = items.map {
        case JDouble(d) => BigDecimal(d)
        case JDecimal(d) => d
        case other => scalaValue(other) // JInt/JLong already BigDecimal
      }
      (field.cast("decimal(38,18)"), vals)
    } else (castTo(field, items.head), items.map(scalaValue))
  }

  private def literal(v: JValue): Column = lit(scalaValue(v))

  private def scalaValue(v: JValue): Any = v match {
    case JInt(i) => BigDecimal(i)
    case JLong(l) => BigDecimal(l)
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JString(s) => s
    case JBool(b) => b
    case JNull => null
    case other => throw new IllegalArgumentException(s"unsupported literal $other")
  }
}
