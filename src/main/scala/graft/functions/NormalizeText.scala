package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: canonical text cleanup for training corpora —
  * Unicode NFC composition, C0/DEL control-character removal, ASCII
  * whitespace-run collapse, and edge trim, in ONE projection.
  *
  * Spark has no NFC builtin, and the regex form
  * (`regexp_replace ∘ regexp_replace`) walks the string once per pattern;
  * this expression normalizes then cleans in a single character walk inside
  * whole-stage codegen (builtin > native Expression > UDF). Semantics are
  * pinned to what an ANSI engine reproduces exactly
  * (`trim(regexp_replace(regexp_replace(nfc_normalize(t), controls, ''),
  * '[ \t\n\r]+', ' '))`), so the op sits under the DuckDB oracle gate:
  *
  *  1. NFC-compose (é as e+U+0301 → U+00E9 — byte-identical text for the
  *     exact-dedup fingerprints upstream of it);
  *  2. drop C0 controls except tab/LF/CR, plus DEL;
  *  3. collapse runs of space/tab/LF/CR to a single space;
  *  4. trim leading/trailing spaces.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects a string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.clean($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** NFC + strip-controls + collapse-whitespace + trim, one walk.
    * Order matters and matches the oracle SQL exactly: controls are removed
    * BEFORE whitespace collapsing (so `"  "` collapses to one space,
    * not two), and only the four ASCII whitespace chars collapse (Unicode
    * spaces like NBSP are content, and Java's `\s` and RE2's disagree on
    * them anyway). Supplementary characters pass through untouched
    * (surrogates are > 0x7F). */
  def clean(s: UTF8String): UTF8String = {
    val composed =
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(composed.length)
    var pendingSpace = false
    var i = 0
    while (i < composed.length) {
      val ch = composed.charAt(i)
      if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') {
        // leading whitespace never flushes (trim-left for free)
        if (sb.length > 0) pendingSpace = true
      } else if (ch < 0x20 || ch == 0x7F) {
        () // control char: removed, contributes nothing (not whitespace)
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
      }
      i += 1
    }
    // a still-pending space at the end is trailing whitespace: dropped
    UTF8String.fromString(sb.toString)
  }
}
