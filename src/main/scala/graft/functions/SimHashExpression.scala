package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array as a native Catalyst expression:
  * bit j of the result is the sign of Σ_tokens (bit j of
  * fnv1a64(token) ? +1 : −1). Replaces the Scala UDF form — no
  * row-level serialization, primitive counters, same output
  * (FNV-1a 64 over UTF-8 bytes, public-domain constants). */
case class SimHash(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // FNV-1a 64 over the token's UTF-8 bytes
      val bytes = s.getBytes
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < bytes.length) { h ^= (bytes(k) & 0xffL); h *= 0x100000001b3L; k += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object SimHash {
  def apply(tokens: Column): Column =
    GraftShim.column(SimHash(GraftShim.expression(tokens)))
}
