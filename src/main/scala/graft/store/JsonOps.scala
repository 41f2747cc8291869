package graft.store

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSON document helpers. `shallowMerge` reproduces Postgres `||` on JSONB
  * (`document || EXCLUDED.document`, queries.rs:146-169): top-level keys of
  * the right operand win, nested objects are *replaced*, not deep-merged —
  * the reference's semantics are shallow (SURVEY.md §7.3).
  */
object JsonOps {
  private val mapper = new ObjectMapper()

  def shallowMergeStrings(a: UTF8String, b: UTF8String): UTF8String = {
    val na = mapper.readTree(a.toString)
    val nb = mapper.readTree(b.toString)
    (na, nb) match {
      case (oa: ObjectNode, ob: ObjectNode) =>
        val out = oa.deepCopy()
        ob.fields().forEachRemaining(e => out.set(e.getKey, e.getValue))
        UTF8String.fromString(mapper.writeValueAsString(out))
      case _ => b
    }
  }

  def shallowMerge(a: Column, b: Column): Column =
    ColumnBridge.column(JsonShallowMerge(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class JsonShallowMerge(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "json_shallow_merge"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two string args")
  override def nullSafeEval(a: Any, b: Any): Any =
    JsonOps.shallowMergeStrings(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.store.JsonOps.shallowMergeStrings($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
