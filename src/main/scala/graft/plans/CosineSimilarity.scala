package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float-vector columns.
  *
  * The composable formulation (zip_with + aggregate + sqrt) works but each
  * higher-order function materializes an intermediate array and evaluates
  * its lambda interpreted, per row. For the ANN scan — the hottest loop in
  * the similarity-search path, executed corpus-size times per query — this
  * expression emits a single fused primitive loop (no allocations, no
  * virtual calls) via doGenCode, staying inside WholeStageCodegen.
  *
  * Semantics match the composable version exactly ON THE ENGINE'S
  * EMBEDDING CONTRACT — equal-length vectors with no null elements
  * (every corpus path guarantees it): dot product, norms, left-to-right
  * double accumulation (bit-identical to a sequential fold — the
  * property the DuckDB oracle comparison relies on). OUTSIDE that
  * contract the two deliberately differ and callers must not mix them:
  * here a null ELEMENT contributes 0 and a ragged pair dots the common
  * prefix, where the composable zip_with/aggregate null-propagates the
  * whole fold to the guarded 0.0; a NULL vector yields SQL NULL here
  * (UnaryExpression null-intolerance) vs 0.0 there.
  * A zero-norm side yields 0.0, NOT 0/0 = NaN: Spark orders NaN as the
  * LARGEST double, so a NaN cosine would rank an all-zero vector as the
  * #1 neighbor of every query and pass every tau threshold — defining
  * the zero vector as similar to nothing is the only ranking-safe
  * semantics (the composable [[graft.functions.VectorFunctions.cosine]]
  * applies the same rule; oracles replay it where a fixture could
  * contain one).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float> args, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yi = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xi * yi
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < x.numElements()) {
      val v = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      na += v * v; i += 1
    }
    var nb = 0.0
    i = 0
    while (i < y.numElements()) {
      val v = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      nb += v * v; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double $yi = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  $na += $v * $v;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $v = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  $nb += $v * $v;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
