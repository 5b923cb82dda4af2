package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: one fused pass from text to the shingle
  * array, replacing tokenize -> posexplode -> window-lead -> concat (a
  * shuffle plus a per-doc sort whose only purpose was adjacency) and the
  * array-lambda formulation (whose tokenizer gets inlined per element by
  * CollapseProject — see graft.operators.Dedup.shingleRows).
  *
  * Semantics match `regexp_extract_all(text, '\S+')` tokenization followed
  * by full n-windows joined with single spaces, with the whole-text
  * fallback for docs shorter than n tokens (an empty doc yields one ""
  * shingle) — the contract the DuckDB oracle reproduces.
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string arg, got $dt")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleArray.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {

  // java.util.regex \s without UNICODE_CHARACTER_CLASS: space, \t, \n,
  // \x0B, \f, \r — all ASCII, so scanning UTF-8 bytes directly is exact
  // (multi-byte UTF-8 sequences never contain ASCII bytes).
  private def isSpace(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Tokenize on ASCII whitespace and emit full n-token windows joined by
    * single spaces; fewer than n tokens (including none) yields one shingle
    * of everything available ("" for empty).
    */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    // token spans as (start, end) offsets
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < bytes.length) {
      if (!isSpace(bytes(i))) {
        val s = i
        while (i < bytes.length && !isSpace(bytes(i))) i += 1
        starts.add(s); ends.add(i)
      } else i += 1
    }
    val nTok = starts.size()
    val nOut = math.max(nTok - (n - 1), 1)
    val out = new Array[Any](nOut)
    var w = 0
    while (w < nOut) {
      val last = math.min(w + n, nTok) - 1
      if (last < w) {
        out(w) = UTF8String.EMPTY_UTF8 // no tokens at all
      } else {
        var len = 0
        var j = w
        while (j <= last) { len += ends.get(j) - starts.get(j); j += 1 }
        len += last - w // single-space joints
        val buf = new Array[Byte](len)
        var pos = 0
        j = w
        while (j <= last) {
          val tl = ends.get(j) - starts.get(j)
          System.arraycopy(bytes, starts.get(j), buf, pos, tl)
          pos += tl
          if (j < last) { buf(pos) = 0x20; pos += 1 }
          j += 1
        }
        out(w) = UTF8String.fromBytes(buf)
      }
      w += 1
    }
    new GenericArrayData(out)
  }
}
