package graft.sql.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-capable Unicode normalization (NFC / NFKC) — the canonical
  * pre-tokenization step Spark has no built-in for: a crawl carries the
  * same text as précomposed é and as e+COMBINING ACUTE, and every
  * downstream exact-hash dedup, gram join, and vocab count treats them
  * as different strings unless normalization runs first. NFKC further
  * folds compatibility forms (ﬁ → fi, fullwidth → ASCII) — the
  * SentencePiece default.
  *
  * A native Expression (not a UDF) so the projection stays inside
  * whole-stage codegen with the rest of the cleaning pipeline; the JVM's
  * `java.text.Normalizer` implements the same Unicode standard DuckDB's
  * `nfc_normalize` does, which is what lets q_text_nfc_audit value-check
  * the output cross-engine.
  */
case class NfcNormalize(child: Expression, nfkc: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (nfkc) "graft_nfkc" else "graft_nfc"

  private def form: java.text.Normalizer.Form =
    if (nfkc) java.text.Normalizer.Form.NFKC
    else java.text.Normalizer.Form.NFC

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = if (nfkc) "NFKC" else "NFC"
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$f))")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
