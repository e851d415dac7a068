package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Web-scraped corpora mix composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) forms of the same visible text — exact dedup, n-gram
  * shingles and fingerprints all fracture on the byte difference unless a
  * canonicalization pass runs first (every major corpus pipeline NFCs).
  * Spark has no built-in for it and a Scala UDF would break whole-stage
  * codegen on the hottest scan of the pipeline; per the extension ladder
  * (SURVEY.md §4.2, the `vec_dot` precedent) that is the case for a
  * custom `Expression` with `doGenCode`, delegating to the JDK's
  * `java.text.Normalizer` — the same Unicode tables DuckDB's
  * `nfc_normalize` implements, which is what makes the q82 oracle a
  * byte-exact cross-engine check. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static call target for both interpreted and generated code paths.
    * Fast path: `Normalizer.isNormalized` is a scan without allocation,
    * and real-world text is overwhelmingly already NFC — the common case
    * costs one pass and zero copies. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TextNormalize {

  /** NFC canonicalization (codegen'd native expression). */
  def nfc(c: Column): Column =
    GraftShims.column(NfcNormalizeExpr(GraftShims.expression(c)))

  /** The standard curation cleanup: NFC, control characters (minus \t\n\r)
    * to spaces, whitespace runs collapsed, trimmed. Pure codegen'd
    * expression chain — map-only over the corpus scan. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(c), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", " "),
      "\\s+", " "))
}
