package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch (Cormode & Muthukrishnan 2005): a fixed
  * depth×width counter grid estimating per-item frequencies from one
  * pass. Completes the sketch family (HLL a21, approx quantiles a26,
  * Bloom d10/d14, MinHash d3, SimHash d4, Misra-Gries t25) with the
  * point-frequency estimator: est(x) = min over rows j of
  * grid[j][h_j(x)] — always ≥ the true count (counters only ever add),
  * and ≤ true + (e/width)·N with probability ≥ 1 − e^−depth per
  * query.
  *
  * Scale shape: the same partial-aggregation contract as avg() — one
  * fixed (depth·width longs) buffer per partition, merged by
  * elementwise addition (exact, commutative, no floating point), so
  * the result is deterministic under ANY partitioning; the corpus
  * never shuffles, only sketch buffers do. Hashes are seeded
  * MurmurHash3 — a pure function of (item, seed, row), so estimates
  * are reproducible across runs and engines running this JVM code.
  */
object CountMin {

  def cell(item: String, row: Int, seed: Long, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(
      item, (seed + row * 0x9e3779b9L).toInt)
    math.floorMod(h, width)
  }

  /** One-pass sketch builder over a string column; null items skipped. */
  class CountMinAgg(depth: Int, width: Int, seed: Long)
      extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], a: String): Array[Long] = {
      if (a != null) {
        var j = 0
        while (j < depth) {
          b(j * width + cell(a, j, seed, width)) += 1
          j += 1
        }
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** `count_min(col)` as an untyped aggregate column. */
  def sketch(depth: Int, width: Int, seed: Long): Column => Column = {
    val f = udaf(new CountMinAgg(depth, width, seed),
      ExpressionEncoder[String]())
    (c: Column) => f(c)
  }

  /** The sketch as (cell_id, cnt) rows — cell_id = row·width + column.
    * This is the STREAMING-STATE representation: CMS merge is
    * elementwise addition, i.e. exactly the monoid-partial contract of
    * [[graft.operators.Cdc.mergeRollup]], so maintaining a corpus
    * sketch over a document stream is just
    * `Cdc.streamingRollup(..., keyCols = Seq("cell_id"),
    * aggregate = b => CountMin.sketchRows(...))` — versioned
    * exactly-once state for free, no sketch-specific protocol. Only
    * touched cells materialize (≤ depth·width rows however large the
    * batch, after map-side combine). */
  def sketchRows(
      items: org.apache.spark.sql.DataFrame, itemCol: String,
      depth: Int, width: Int, seed: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cellU = udf((t: String, j: Int) => j * width + cell(t, j, seed, width))
    items
      .filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("_t"),
        explode(typedLit((0 until depth).toList)).as("_j"))
      .select(cellU(col("_t"), col("_j")).as("cell_id"))
      .groupBy("cell_id").agg(count(lit(1)).as("cnt"))
  }

  /** Rebuild the dense grid from the rows form (absent cells are 0). */
  def gridOfRows(
      rows: org.apache.spark.sql.DataFrame, depth: Int, width: Int): Array[Long] = {
    val g = new Array[Long](depth * width)
    rows.collect().foreach { r =>
      g(r.getAs[Number]("cell_id").intValue()) = r.getAs[Long]("cnt")
    }
    g
  }

  /** Point estimate from a built sketch (driver- or executor-side). */
  def estimate(
      grid: Array[Long], depth: Int, width: Int, seed: Long)(
      item: String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val v = grid(j * width + cell(item, j, seed, width))
      if (v < best) best = v
      j += 1
    }
    best
  }
}
