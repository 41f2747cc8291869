package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Named text splitters — the `pgml.chunk(splitter, text, {chunk_size,
  * chunk_overlap})` operator (reference: pgml-extension/src/api.rs:650-668,
  * which delegates to LangChain's splitter registry; semantics
  * re-implemented from the published algorithms, not ported code).
  *
  * Splitters (each a separator LIST driving the same merge algorithm):
  *  - `recursive_character` (the SDK default): try "\n\n", "\n", " ", ""
  *    in order; split on the first that appears; greedily merge splits
  *    into chunks of at most `chunkSize` characters; consecutive chunks
  *    share up to `overlap` characters of suffix context; oversized
  *    splits recurse with the next separator.
  *  - `character`: one separator ("\n\n"), no recursion — an oversized
  *    split is emitted whole (LangChain's CharacterTextSplitter keeps
  *    oversized chunks too, it only warns).
  *  - `markdown`: the recursive algorithm over markdown structure
  *    separators (headings h1–h6, fenced code, rules) before the prose
  *    ones — LangChain's MarkdownTextSplitter separator set, with the
  *    heading family as literal `\n#… ` prefixes (documented
  *    simplification of its `#{1,6}` regex).
  */
object ChunkKernel {

  val RecursiveSeparators: Array[String] = Array("\n\n", "\n", " ", "")
  val CharacterSeparators: Array[String] = Array("\n\n")
  val MarkdownSeparators: Array[String] = Array(
    "\n# ", "\n## ", "\n### ", "\n#### ", "\n##### ", "\n###### ",
    "```\n", "\n***\n", "\n---\n", "\n___\n", "\n\n", "\n", " ", "")

  // indexed for codegen (an int literal beats escaping a string literal)
  private[graft] val separatorSets: Array[Array[String]] =
    Array(RecursiveSeparators, CharacterSeparators, MarkdownSeparators)

  // keep_separator per set: the markdown splitter re-attaches each
  // separator to the part that FOLLOWS it (LangChain MarkdownTextSplitter
  // passes keep_separator=True), so a section starting a new chunk keeps
  // its '\n## ' heading marker instead of losing it at the boundary. The
  // prose sets keep LangChain's consume-and-rejoin default.
  private[graft] val keepSeparatorSets: Array[Boolean] = Array(false, false, true)

  val splitterNames: Seq[String] = Seq("recursive_character", "character", "markdown")

  def setIdFor(splitter: String): Int = {
    val i = splitterNames.indexOf(splitter)
    require(i >= 0,
      s"unknown splitter '$splitter' (supported: ${splitterNames.mkString(", ")})")
    i
  }

  def chunk(text: String, chunkSize: Int, overlap: Int): Array[String] =
    chunk(text, chunkSize, overlap, 0)

  def chunk(text: String, chunkSize: Int, overlap: Int, setId: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    split(separatorSets(setId), keepSeparatorSets(setId), text, 0, chunkSize, overlap, out)
    out.filter(_.trim.nonEmpty).toArray
  }

  private def split(
      separators: Array[String], keepSep: Boolean,
      text: String, sepIdx: Int, chunkSize: Int, overlap: Int,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (text.length <= chunkSize) { if (text.nonEmpty) out += text; return }
    val sep = separators(sepIdx)
    val rawParts: Array[String] =
      if (sep.isEmpty) text.grouped(chunkSize).toArray
      else text.split(java.util.regex.Pattern.quote(sep), -1)
    // keep_separator: the separator rides at the HEAD of the part after it
    // (parts then merge with an empty join), so structural markers survive
    // chunk boundaries
    val parts: Array[String] =
      if (keepSep && sep.nonEmpty)
        rawParts.zipWithIndex.map { case (p, i) => if (i == 0) p else sep + p }
      else rawParts
    if (rawParts.length <= 1 && sepIdx < separators.length - 1) {
      split(separators, keepSep, text, sepIdx + 1, chunkSize, overlap, out); return
    }
    val joinSep = if (keepSep) "" else sep
    val joinLen = joinSep.length
    var current = new StringBuilder
    parts.foreach { p =>
      if (p.length > chunkSize) {
        if (current.nonEmpty) { out += current.toString; current = new StringBuilder }
        if (sepIdx < separators.length - 1)
          split(separators, keepSep, p, sepIdx + 1, chunkSize, overlap, out)
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
        if (current.nonEmpty) current ++= joinSep
        current ++= p
      }
    }
    if (current.nonEmpty) out += current.toString
  }
}

/** `chunk_text(text)` → array<string> chunks. */
case class ChunkText(child: Expression, chunkSize: Int, overlap: Int, setId: Int = 0)
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
    val chunks = ChunkKernel.chunk(v.asInstanceOf[UTF8String].toString, chunkSize, overlap, setId)
    new GenericArrayData(chunks.map(UTF8String.fromString(_)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ChunkKernelJ.chunkUtf8($a, $chunkSize, $overlap, $setId))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Java-callable helper for codegen (returns UTF8String[] directly). */
object ChunkKernelJ {
  def chunkUtf8(text: UTF8String, chunkSize: Int, overlap: Int, setId: Int): Array[UTF8String] =
    ChunkKernel.chunk(text.toString, chunkSize, overlap, setId).map(UTF8String.fromString(_))
}

object ChunkFunctions {
  def chunkText(text: Column, chunkSize: Int = 1500, overlap: Int = 40,
      splitter: String = "recursive_character"): Column =
    ColumnBridge.column(ChunkText(ColumnBridge.expression(text), chunkSize, overlap,
      ChunkKernel.setIdFor(splitter)))
}
