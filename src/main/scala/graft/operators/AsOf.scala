package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent
  * right row of the same key with right.ts ≤ left.ts — the canonical
  * event-log / feature-store lookup Spark has no built-in operator
  * for.
  *
  * Spark-first composition (SURVEY.md §4.3 escalation rule (a)):
  * union both sides tagged, one hash shuffle on the key, one bounded
  * per-key sort, and `last(_, ignoreNulls)` over the preceding-rows
  * frame carries the latest right payload forward onto left rows.
  * No range-join explosion, no per-row subquery: cost is
  * sort-within-partitions of |L|+|R| — the shape that survives 100 TB
  * event logs.
  *
  * Skew caveat: a hot key serializes into one partition, and plain
  * salting is NOT sound here — the carried last-right-row would not
  * cross salt buckets. The scale-safe remedy is time-range bucketing:
  * split each hot key's timeline into ranges, compute within-range
  * as-of plus each range's closing right row, then carry boundary
  * state into the next range (a second, tiny pass over range
  * boundaries). Not implemented — the single-shuffle form is the
  * declared operator; callers with a pathological key should
  * pre-split by time range.
  */
object AsOf {

  /** leftTs/rightTs must be the same orderable type (use epoch µs
    * longs for engine-portable semantics). Right rows at exactly
    * left.ts are included (inclusive ≤, DuckDB ASOF parity). Output:
    * all left columns + the right payload columns (null when no prior
    * right row exists). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left.select(
      col(keyCol), col(tsCol),
      struct(lCols.map(col): _*).as("_l"),
      lit(1).as("_side"))
    val r = right.select(
      col(keyCol), col(tsCol),
      struct(rightPayload.map(col): _*).as("_r"),
      lit(0).as("_side"))
    val u = l.unionByName(r.withColumn("_l", lit(null).cast(l.schema("_l").dataType)),
      allowMissingColumns = true)
    // right (_side=0) sorts before left (_side=1) at equal ts →
    // inclusive; the payload hash totalizes the order among right rows
    // sharing (key, ts) so the carried match is deterministic under
    // any partitioning
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), xxhash64(col("_r")))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = u
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val outL = lCols.map(c => col(s"_l.$c").as(c))
    val outR = rightPayload.map(c => col(s"_m.$c").as(s"asof_$c"))
    matched.select(outL ++ outR: _*)
  }
}
