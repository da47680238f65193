package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen expression —
  * the first step of text canonicalization before hashing/dedup: "é" as
  * U+00E9 and as e+U+0301 must fingerprint identically or every
  * accent-decomposed copy of a document escapes deduplication.
  *
  * Spark ships no normalization built-in; a codegen'd call into the JDK's
  * `java.text.Normalizer` (stays inside WholeStageCodegen, no UDF
  * serialization) is the native-expression route SURVEY §7.2 prescribes.
  * Cross-engine parity: NFC is a Unicode standard — DuckDB's
  * `nfc_normalize` produces identical output, so normalized fingerprints
  * stay portable (the [[PortableHash]] property).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Already-normalized input (all-ASCII in particular) returns the SAME
    * UTF8String — the overwhelmingly common case allocates nothing.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object TextNorm {

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Canonical text normalization for fingerprinting/dedup:
    * NFC → lowercase → non-alphanumerics to spaces → whitespace runs
    * collapsed → trimmed. Pure per-row expressions (one codegen span, no
    * shuffle); every step has an exact DuckDB twin
    * (`nfc_normalize`/`lower`/`regexp_replace` with 'g'), so normalized
    * content hashes reproduce outside Spark. `\p{L}\p{N}` classes keep
    * the rule Unicode-wide, not ASCII-bound.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(nfcNormalize(c)), "[^\\p{L}\\p{N}\\s]", " "),
      "\\s+", " "))
}

