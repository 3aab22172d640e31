package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass every text-dedup pipeline needs BEFORE
  * fingerprinting: "é" as U+00E9 and as e+U+0301 are byte-different,
  * so md5/MinHash/shingle signatures split what a reader sees as one
  * string, silently halving dedup recall on decomposed corpora (macOS
  * filenames, some OCR output, NFD-normalized upstreams).
  *
  * Spark has no built-in for this; the implementation is the JDK's
  * `java.text.Normalizer` (ICU-independent, ships in `java.base`),
  * wrapped as a UnaryExpression with `doGenCode` so the call inlines
  * into whole-stage codegen — no UDF boundary, no row-at-a-time
  * interpretation overhead beyond the (inherent) String round-trip.
  *
  * Engine parity: NFC is a Unicode-standard algorithm; DuckDB's
  * `nfc_normalize` and the JDK agree on it, so the t29 oracle compares
  * md5 fingerprints of the normalized output byte-for-byte. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
