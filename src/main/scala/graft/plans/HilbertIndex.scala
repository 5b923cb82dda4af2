package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 2-D Hilbert-curve index (the canonical xy2d walk): maps a
  * (x, y) cell on the 2^bits x 2^bits grid to its position along the
  * Hilbert space-filling curve.
  *
  * Why a second curve next to Z-order (`DataSkipping.zValue`): both
  * linearize 2-D keys so range-clustered files get tight per-file
  * min/max envelopes on BOTH columns, but Z-order's bit interleave has
  * long diagonal jumps at power-of-two boundaries (the curve leaves and
  * re-enters a quadrant), while the Hilbert curve is continuous — every
  * step moves to an adjacent cell — so an axis-aligned query box
  * touches fewer distinct curve ranges, i.e. fewer files at equal file
  * count. The classical result (Moon et al., "Analysis of the
  * clustering properties of the Hilbert space-filling curve") is ~25-50%
  * fewer cluster splits per box; the DataSkippingSpec probe measures it
  * on real files.
  *
  * Why a native expression: the walk is a 16-iteration loop whose state
  * (x, y rotate/reflect each round) feeds the next round — composed
  * Column arithmetic would double the expression tree per round (2^bits
  * nodes); this node plans in constant time and emits one fused loop
  * inside WholeStageCodegen. Inputs are masked to the grid
  * (`v & (2^bits - 1)`) so any long is a valid cell; the DuckDB oracle
  * replays the identical masked walk with a recursive CTE.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert requires two bigint args, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(xAny: Any, yAny: Any): Any = {
    val n = 1L << bits
    var x = xAny.asInstanceOf[Long] & (n - 1)
    var y = yAny.asInstanceOf[Long] & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xIn, yIn) => {
      val n = s"(1L << $bits)"
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xIn & ($n - 1L);
         |long $y = $yIn & ($n - 1L);
         |long $d = 0L;
         |for (long $s = $n >> 1; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $n - 1L - $x; $y = $n - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
