package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression (`graft_nfc`) — the
  * canonical-composition pass web-text curation runs BEFORE hashing or
  * deduplicating: the same visible text arrives from different sources
  * as precomposed codepoints (é) or base + combining mark (e U+0301),
  * and every md5/shingle/fingerprint operator in this engine would see
  * those as different documents. Normalizing to NFC first makes the
  * digest family see one text.
  *
  * Semantics are the Unicode canonical composition the JDK ships
  * (`java.text.Normalizer`, Form.NFC) — a versioned public standard, so
  * DuckDB's `nfc_normalize` replays it bit-for-bit and the gate can
  * hash-compare normalized output across engines. Compatibility-only
  * forms (the fi ligature) are deliberately preserved: NFC never
  * changes what the text MEANS, only how it is encoded — NFKC-style
  * folding is a lossier, separate decision.
  *
  * Why a native expression: there is no built-in Spark function for
  * Unicode normalization and the no-row-UDF rule holds engine-wide;
  * this node evaluates inside WholeStageCodegen as one JDK static call
  * per row with no serialization boundary.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string arg, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    // isNormalized is a cheap quick-check that passes for nearly all
    // real text (ASCII and precomposed) — skip both the normalize and
    // the String -> UTF8String re-encode on the hot pre-dedup path
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("nfcs")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized(
         |    $s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
