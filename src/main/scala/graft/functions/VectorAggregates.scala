package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise vector aggregation as a typed Aggregator — the scale
  * form of "mean embedding per group" (class centroids, cluster
  * prototypes, drift baselines). The naive forms either explode the
  * corpus ×dim (posexplode + groupBy(key, pos): dim× the shuffle
  * volume) or collect_list whole groups onto single reducers; this
  * aggregator keeps one fixed-size (dim doubles + count) buffer per
  * group per partition, combines map-side, and shuffles only those
  * partial buffers — the same partial-aggregation contract as
  * built-in avg(), just vector-valued. */
object VectorAggregates {

  /** Mutable partial state: elementwise running sum + row count.
    * Encoded as a product for the shuffle. */
  case class VecSum(sum: Array[Double], n: Long)

  /** Mean over `Array[Float]` vectors; null inputs and (defensively)
    * wrong-length vectors are skipped so a ragged row poisons nothing.
    * Empty groups yield null. */
  class VectorMean(dim: Int)
      extends Aggregator[Array[Float], VecSum, Array[Double]] {
    def zero: VecSum = VecSum(Array.fill(dim)(0.0), 0L)
    def reduce(b: VecSum, a: Array[Float]): VecSum = {
      if (a == null || a.length != dim) b
      else {
        var i = 0
        while (i < dim) { b.sum(i) += a(i); i += 1 }
        VecSum(b.sum, b.n + 1)
      }
    }
    def merge(x: VecSum, y: VecSum): VecSum = {
      var i = 0
      while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
      VecSum(x.sum, x.n + y.n)
    }
    def finish(r: VecSum): Array[Double] =
      if (r.n == 0L) null else r.sum.map(_ / r.n)
    def bufferEncoder: Encoder[VecSum] = ExpressionEncoder[VecSum]()
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** `mean_vector(col)` as an untyped aggregate column. */
  def meanVector(dim: Int): Column => Column = {
    val f = udaf(new VectorMean(dim), ExpressionEncoder[Array[Float]]())
    (c: Column) => f(c)
  }
}
