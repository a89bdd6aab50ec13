package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature as a native Catalyst expression:
  * array<string> shingles → array<long> of `numHashes` running minima
  * under h_i(x) = (a_i·pmod(xxhash64(x), p) + b_i) mod p, p = 2^31-1.
  *
  * Semantically identical (bit-for-bit, asserted in DedupTextSpec) to
  * the pure-HOF formulation (one aggregate() fold), but the
  * primitive-array inner loop avoids the per-shingle 64-element array
  * allocation the HOF fold pays — the signature is the hot kernel of
  * corpus-wide MinHash dedup, worth the Expression per SURVEY.md §4.3's
  * escalation rule. Interpreted eval (CodegenFallback): the loop body
  * JITs well and the expression is called once per row.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  private val P: Long = 2147483647L // 2^31 - 1

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val (as: Array[Long], bs: Array[Long]) = {
    // same draw order as Dedup.hashParams: (a, b) pairs interleaved
    val r = new java.util.Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = math.abs(r.nextLong()) % (P - 1) + 1
      b(i) = math.abs(r.nextLong()) % P
      i += 1
    }
    (a, b)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(P)
    var i = 0
    while (i < n) {
      val raw = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      val h = ((raw % P) + P) % P
      var j = 0
      while (j < numHashes) {
        val cand = (as(j) * h + bs(j)) % P
        if (cand < sig(j)) sig(j) = cand
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  def apply(shingles: Column, numHashes: Int, seed: Long): Column =
    GraftShim.column(MinHashSignature(GraftShim.expression(shingles), numHashes, seed))
}
