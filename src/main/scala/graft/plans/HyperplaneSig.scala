package graft.plans

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}

/** Native random-hyperplane LSH signature over a float-vector column.
  *
  * The composable formulation (`planes * dims` literal-weight multiply terms
  * reduced into one expression tree) is semantically right but builds a
  * 256-node tree per signature: Catalyst spends minutes canonicalizing /
  * optimizing it and Janino compiles a method per term — measured ~240 s of
  * one-time planning+codegen for the sf0.1 ANN query before any row moves.
  * This expression is a single tree node emitting one fused loop, so plan
  * time is flat in `planes * dims` and the hot loop stays in
  * WholeStageCodegen.
  *
  * Bit semantics are identical to the composable version (and the DuckDB
  * oracle): bit p = 1 iff the left-to-right double accumulation of
  * vec[d] * w(p,d) over d < dims is >= 0; a vector shorter than `dims` or
  * containing a null element yields bit 0 (null-propagation semantics of
  * the composable sum). Weights w(p,d) are [[VectorFunctions.planeWeight]]
  * — md5-derived exact halves, no RNG, reproducible on any engine.
  */
case class HyperplaneSig(child: Expression, planes: Int, dims: Int)
  extends UnaryExpression {

  // planes = 0 would emit an empty signature for EVERY row — the bucket
  // equi-join degenerates to the full cross product LSH exists to avoid;
  // negative values would crash per row instead of at analysis
  require(planes >= 1 && dims >= 1,
    s"graft_hplane_sig needs planes >= 1 and dims >= 1, got $planes/$dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_hplane_sig requires an array<float> arg, got $dt")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_hplane_sig"

  // planes x dims weight matrix, materialized once per expression instance
  // and shipped to executors as a codegen reference object.
  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => VectorFunctions.planeWeight(p, d))

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val bits = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var isNull = vec.numElements() < dims
      var d = 0
      while (!isNull && d < dims) {
        if (vec.isNullAt(d)) isNull = true
        else acc += vec.getFloat(d).toDouble * weights(p)(d)
        d += 1
      }
      bits(p) = if (!isNull && acc >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val w = ctx.addReferenceObj("hplaneWeights", weights, "double[][]")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val isNull = ctx.freshName("anyNull")
      s"""
         |byte[] $bits = new byte[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $acc = 0.0;
         |  boolean $isNull = $vec.numElements() < $dims;
         |  for (int $d = 0; !$isNull && $d < $dims; $d++) {
         |    if ($vec.isNullAt($d)) { $isNull = true; }
         |    else { $acc += ((double) $vec.getFloat($d)) * $w[$p][$d]; }
         |  }
         |  $bits[$p] = (byte) ((!$isNull && $acc >= 0) ? '1' : '0');
         |}
         |${ev.value} = UTF8String.fromBytes($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
