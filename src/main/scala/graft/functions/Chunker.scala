package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Recursive-character text splitter — the `pgml.chunk('recursive_character',
  * text, {chunk_size, chunk_overlap})` operator (reference: pgml-extension/
  * src/api.rs:650-668, which delegates to LangChain's
  * RecursiveCharacterTextSplitter; semantics re-implemented from the
  * published algorithm, not ported code).
  *
  * Algorithm: try separators in order ("\n\n", "\n", " ", ""); split on the
  * first that appears; greedily merge splits into chunks of at most
  * `chunkSize` characters; consecutive chunks share up to `overlap`
  * characters of suffix context. Oversized splits recurse with the next
  * separator.
  */
object ChunkKernel {

  private val separators = Array("\n\n", "\n", " ", "")

  def chunk(text: String, chunkSize: Int, overlap: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    split(text, 0, chunkSize, overlap, out)
    out.filter(_.trim.nonEmpty).toArray
  }

  private def split(
      text: String, sepIdx: Int, chunkSize: Int, overlap: Int,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (text.length <= chunkSize) { if (text.nonEmpty) out += text; return }
    val sep = separators(sepIdx)
    val parts: Array[String] =
      if (sep.isEmpty) text.grouped(chunkSize).toArray
      else text.split(java.util.regex.Pattern.quote(sep), -1)
    if (parts.length <= 1 && sepIdx < separators.length - 1) {
      split(text, sepIdx + 1, chunkSize, overlap, out); return
    }
    val joinLen = sep.length
    var current = new StringBuilder
    parts.foreach { p =>
      if (p.length > chunkSize) {
        if (current.nonEmpty) { out += current.toString; current = new StringBuilder }
        if (sepIdx < separators.length - 1) split(p, sepIdx + 1, chunkSize, overlap, out)
        else out += p
      } else {
        val add = (if (current.nonEmpty) joinLen else 0) + p.length
        if (current.length + add > chunkSize && current.nonEmpty) {
          val done = current.toString
          out += done
          current = new StringBuilder
          // carry overlap: last `overlap` chars of the finished chunk
          if (overlap > 0) {
            val tail = done.substring(math.max(0, done.length - overlap))
            current ++= tail
          }
        }
        if (current.nonEmpty) current ++= sep
        current ++= p
      }
    }
    if (current.nonEmpty) out += current.toString
  }
}

/** `chunk_text(text)` → array<string> chunks. */
case class ChunkText(child: Expression, chunkSize: Int, overlap: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chunk_text"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && chunkSize > 0 && overlap >= 0 && overlap < chunkSize)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, chunkSize>0, 0<=overlap<chunkSize")
  override def nullSafeEval(v: Any): Any = {
    val chunks = ChunkKernel.chunk(v.asInstanceOf[UTF8String].toString, chunkSize, overlap)
    new GenericArrayData(chunks.map(UTF8String.fromString(_)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ChunkKernelJ.chunkUtf8($a, $chunkSize, $overlap))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Java-callable helper for codegen (returns UTF8String[] directly). */
object ChunkKernelJ {
  def chunkUtf8(text: UTF8String, chunkSize: Int, overlap: Int): Array[UTF8String] =
    ChunkKernel.chunk(text.toString, chunkSize, overlap).map(UTF8String.fromString(_))
}

object ChunkFunctions {
  def chunkText(text: Column, chunkSize: Int = 1500, overlap: Int = 40): Column =
    ColumnBridge.column(ChunkText(ColumnBridge.expression(text), chunkSize, overlap))
}
