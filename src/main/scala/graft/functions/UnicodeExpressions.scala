package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (the canonical-composition pass a
  * multilingual corpus needs BEFORE fingerprinting/dedup: "café" with
  * a precomposed é and "café" with e + U+0301 are byte-different,
  * dedup-identical documents). Implemented as a native codegen'd
  * Catalyst expression over java.text.Normalizer — no UDF
  * serialization, stays inside whole-stage codegen; DuckDB's
  * `nfc_normalize` computes the identical ICU/Unicode mapping, which
  * is what makes the t40 oracle portable. */
object UnicodeNorm {
  /** JVM kernel, shared by interpreted eval and generated code. Two
    * fast paths: all-ASCII input (the common corpus row) is NFC by
    * definition and returns after one byte scan with ZERO allocation
    * — no String materializes at all; non-ASCII but already-NFC text
    * pays the UTF-16 transcode for the quick-check scan and returns
    * the original UTF8String. Only genuinely denormalized text pays
    * the normalize. */
  def nfc(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder on the object's mirror class — a plain static
    // call inside the generated code, no reflection, no boxing
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

object NfcNormalize {
  def apply(text: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(text)))
}
