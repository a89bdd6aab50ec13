package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed PCA over an embedding column — the whitening /
  * dimensionality-reduction step of a training-data pipeline (feature
  * compression before clustering, cheap pre-rank for retrieval, drift
  * visualization). Reference analogue: none (the reference stores raw
  * 1536-dim vectors, `config/init.sql:31`); this is beyond-parity
  * surface in the same family as the matryoshka prefix search (v18),
  * which PCA generalizes to corpora whose embedders were NOT trained
  * nested.
  *
  * Scale shape: ONE pass over the corpus accumulating a fixed-size
  * moment buffer per partition — the elementwise sum (dim doubles) and
  * the upper-triangular sum of outer products (dim·(dim+1)/2 doubles).
  * Partials combine map-side exactly like built-in avg(); the shuffle
  * carries #partitions buffers, never rows. The eigendecomposition
  * runs driver-side on the dim×dim covariance (dim is small by
  * construction — 64 here, ≤ a few thousand in practice; the corpus
  * dimension N never appears in the solve). Projection is then a pure
  * map-side broadcast dot product, so transforming 100 TB of vectors
  * is embarrassingly parallel with zero shuffles.
  */
object Pca {

  /** Moment partials: Σx (dim), upper-triangle Σx·xᵀ, row count. */
  case class Moments(sum: Array[Double], outer: Array[Double], n: Long)

  /** Trained model: corpus mean, top-k orthonormal components (rows),
    * matching covariance eigenvalues (descending), corpus size. */
  case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      n: Long)

  /** Single-pass covariance-moment accumulator. Null / ragged vectors
    * are skipped so one bad row poisons nothing (same contract as
    * [[graft.functions.VectorAggregates.VectorMean]]). */
  class MomentsAgg(dim: Int)
      extends Aggregator[Array[Float], Moments, Moments] {
    private val tri = dim * (dim + 1) / 2
    def zero: Moments = Moments(new Array[Double](dim), new Array[Double](tri), 0L)
    def reduce(b: Moments, a: Array[Float]): Moments = {
      if (a == null || a.length != dim) b
      else {
        var i = 0
        var t = 0
        while (i < dim) {
          val ai = a(i).toDouble
          b.sum(i) += ai
          var j = i
          while (j < dim) {
            b.outer(t) += ai * a(j)
            t += 1
            j += 1
          }
          i += 1
        }
        Moments(b.sum, b.outer, b.n + 1)
      }
    }
    def merge(x: Moments, y: Moments): Moments = {
      var i = 0
      while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
      var t = 0
      while (t < x.outer.length) { x.outer(t) += y.outer(t); t += 1 }
      Moments(x.sum, x.outer, x.n + y.n)
    }
    def finish(r: Moments): Moments = r
    def bufferEncoder: Encoder[Moments] = ExpressionEncoder[Moments]()
    def outputEncoder: Encoder[Moments] = ExpressionEncoder[Moments]()
  }

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix (public
    * textbook algorithm — Golub & Van Loan §8.5). Returns
    * (eigenvalues, eigenvectors as rows), unsorted. O(dim³) per sweep,
    * a few sweeps to machine precision; driver-side only, on the
    * dim×dim covariance. */
  private[graft] def symEig(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    // v holds eigenvectors as COLUMNS during rotation (v := v·J)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    // RELATIVE convergence threshold (vs the Frobenius norm of the
    // input): an absolute cutoff misbehaves at both magnitude
    // extremes — tiny covariances (entries ≲1e-12) start below it and
    // exit with zero rotations (identity "eigenvectors"), large ones
    // have an off() floor of ~(eps·‖A‖)² that never reaches it and
    // always burn all 64 sweeps. 1e-18·‖A‖²_F tracks double precision
    // (≈ squared eps per entry) at any scale.
    val frobSq = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    val tol = 1e-18 * frobSq
    var sweep = 0
    while (sweep < 64 && off() > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(n)(i => a(i)(i))
    val rows = Array.tabulate(n)(j => Array.tabulate(n)(i => v(i)(j)))
    (eig, rows)
  }

  /** Fit a k-component model: one moment-aggregation job + a
    * driver-side dim×dim eigensolve. Components get a deterministic
    * sign convention (largest-|coefficient| entry positive, lowest
    * index on ties) so the model is reproducible up to float-sum
    * ordering of the partials. */
  def fit(df: DataFrame, embCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1,$dim], got $k")
    // the moment buffer is O(dim²) doubles PER PARTITION (dim 64 →
    // ~17 KB; dim 4096 → ~67 MB — at that point use a sketched /
    // randomized solver instead, this exact-covariance path is for
    // the embedding-sized regime)
    require(dim <= 2048,
      s"exact-covariance PCA is for dim ≤ 2048 (buffer is O(dim²)); got $dim")
    val agg = udaf(new MomentsAgg(dim), ExpressionEncoder[Array[Float]]())
    val r = df
      .select(col(embCol).cast("array<float>").as("e"))
      .agg(agg(col("e")).as("m"))
      .selectExpr("m.sum", "m.outer", "m.n")
      .head()
    val sum = r.getSeq[Double](0).toArray
    val outer = r.getSeq[Double](1).toArray
    val n = r.getLong(2)
    require(n >= 2, s"PCA needs at least 2 vectors, got $n")
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (outer(t) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val (eig, vecs) = symEig(cov)
    val order = eig.indices.sortBy(ix => (-eig(ix), ix)).take(k)
    val comps = order.map { ix =>
      val raw = vecs(ix)
      var best = 0
      var j = 1
      while (j < raw.length) {
        if (math.abs(raw(j)) > math.abs(raw(best))) best = j
        j += 1
      }
      if (raw(best) < 0) raw.map(v => -v) else raw
    }.toArray
    PcaModel(mean, comps, order.map(eig(_)).toArray, n)
  }

  /** Raw (unrounded, unnamed) projection expression for component j:
    * `dot(x, cⱼ) − dot(mean, cⱼ)` with the mean term folded to a
    * literal. Pure map-side codegen arithmetic over the broadcast
    * component — no shuffle, no UDF in the hot path. */
  def projection(embCol: String, model: PcaModel, j: Int): Column = {
    val comp = model.components(j)
    val meanDot = model.mean.zip(comp).map { case (m, c) => m * c }.sum
    VectorFunctions.dot_product(col(embCol), typedLit(comp)) - lit(meanDot)
  }

  /** `df` with pc1..pck appended (rounded to `scale` decimals for
    * engine-portable determinism, per the VectorQueries contract). */
  def project(
      df: DataFrame, embCol: String, model: PcaModel,
      scale: Int = 6): DataFrame = {
    val pcs = model.components.indices.map(j =>
      round(projection(embCol, model, j), scale).as(s"pc${j + 1}"))
    df.select(df.columns.map(col) ++ pcs: _*)
  }
}
