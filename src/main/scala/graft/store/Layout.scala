package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Sorting a table by one column makes parquet min/max statistics
  * razor-sharp for THAT column and useless for every other: each file
  * then spans the full range of the secondary key, so a filter on it
  * prunes nothing. Interleaving the bits of two keys' normalized
  * bucket numbers produces a 1-D sort order in which files are
  * rectangles in the 2-D key space — BOTH columns get narrow per-file
  * ranges, and parquet's footer/row-group statistics (the mechanism
  * `ParquetStats` reads) prune scans on either predicate. This is the
  * standard lakehouse technique (Delta/Iceberg expose it as OPTIMIZE
  * ZORDER / sort-order transforms); here it is a plain column
  * expression plus repartitionByRange, nothing engine-specific.
  *
  * Normalization is uniform min/max bucketing — adequate for roughly
  * uniform keys (range-partition ranks are the skew-robust upgrade and
  * slot into the same interleave expression).
  */
object Layout {

  /** Morton key for two long columns given their value bounds:
    * each value is scaled to a `bits`-bit bucket, and the bucket bits
    * are interleaved (c1 on even positions, c2 on odd). Pure codegen
    * arithmetic — the HOF lambda touches only bound attributes and
    * literals. */
  def zOrderKey(
      c1: Column, lo1: Long, hi1: Long,
      c2: Column, lo2: Long, hi2: Long,
      bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val max = (1L << bits) - 1
    def bucket(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else least(lit(max), greatest(lit(0L),
        ((c.cast("double") - lo) / (hi - lo) * max).cast("long")))
    val b1 = bucket(c1, lo1, hi1)
    val b2 = bucket(c2, lo2, hi2)
    // interleave: Σ_i bit_i(b1)·2^{2i} + bit_i(b2)·2^{2i+1}; 2^e via
    // pow is exact for e < 53, and 2·bits+1 ≤ 63 keeps the key a long
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) => {
        val p = pow(lit(2.0), i).cast("long")
        val bit1 = (b1 / p).cast("long") % 2
        val bit2 = (b2 / p).cast("long") % 2
        acc + bit1 * pow(lit(2.0), i * 2).cast("long") +
          bit2 * pow(lit(2.0), i * 2 + 1).cast("long")
      })
  }

  /** Write `df` Z-ordered on two long columns: bounds from one min/max
    * aggregation (write-time batch cost), range partition + local sort
    * on the Morton key so each output file covers a compact rectangle
    * of the (col1, col2) space. `files` sizes the output (at scale:
    * target bytes per file, not a constant). */
  def writeZOrdered(
      df: DataFrame, path: String, col1: String, col2: String,
      files: Int = 8, bits: Int = 16): Unit = {
    val b = df.agg(
      min(col(col1)).cast("long"), max(col(col1)).cast("long"),
      min(col(col2)).cast("long"), max(col(col2)).cast("long")).head()
    val z = zOrderKey(
      col(col1), b.getLong(0), b.getLong(1),
      col(col2), b.getLong(2), b.getLong(3), bits)
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }
}
