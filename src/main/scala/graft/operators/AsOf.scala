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
  * cross salt buckets. The scale-safe remedy is time-range bucketing
  * (`asofJoinSkewSafe` below): split each key's timeline into ranges,
  * compute within-range as-of, then resolve rows with no within-range
  * match against each range's closing right row via a second as-of
  * over the per-(key, range) summary — whose size per key is bounded
  * by the range count, so the hot key's row volume never lands in one
  * partition.
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
      rightPayload: Seq[String]): DataFrame =
    asofJoinKeys(left, right, Seq(keyCol), tsCol, rightPayload)

  /** Multi-column-key form (the building block the skew-safe variant
    * partitions by (key, time-range)). */
  /** When `withMatchFlag`, adds `_matched`: whether ANY right row ≤ ts
    * existed — distinct from payload nullness (a matched right row may
    * carry null payload values; the struct itself is still non-null). */
  private def asofJoinKeys(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightPayload: Seq[String],
      withMatchFlag: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol),
        struct(lCols.map(col): _*).as("_l"),
        lit(1).as("_side")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol),
        struct(rightPayload.map(col): _*).as("_r"),
        lit(0).as("_side")): _*)
    val u = l.unionByName(r.withColumn("_l", lit(null).cast(l.schema("_l").dataType)),
      allowMissingColumns = true)
    // right (_side=0) sorts before left (_side=1) at equal ts →
    // inclusive; the payload hash totalizes the order among right rows
    // sharing (key, ts) so the carried match is deterministic under
    // any partitioning
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"), xxhash64(col("_r")))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = u
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val outL = lCols.map(c => col(s"_l.$c").as(c))
    val outR = rightPayload.map(c => col(s"_m.$c").as(s"asof_$c"))
    val flag = if (withMatchFlag) Seq(col("_m").isNotNull.as("_matched")) else Nil
    matched.select(outL ++ outR ++ flag: _*)
  }

  /** Skew-safe as-of join — identical semantics to `asofJoin`, safe
    * when one key carries an unbounded share of the rows.
    *
    * Phase 1: bucket the time axis into `buckets` fixed ranges and run
    * the as-of partitioned by (key, bucket) — each window partition
    * now holds only a 1/buckets slice of a hot key.
    * Phase 2: left rows with no within-bucket match need the latest
    * right row from an EARLIER bucket. Summarize each (key, bucket) to
    * its closing right row (an aggregation, skew-tolerable via partial
    * aggs), then as-of join the unmatched rows onto that summary by
    * bucket number — per key the summary has ≤ `buckets` rows, so this
    * second pass cannot be skewed by data volume.
    *
    * The closing-row tie-break (max by (ts, xxhash64(payload))) is the
    * same total order `asofJoin` uses, so results are bit-identical to
    * the single-shuffle form.
    *
    * `bounds`: optional explicit (lo, hi) of the ts domain (epoch-long
    * units of `tsCol`). When absent, a min/max pre-aggregation derives
    * them — one extra scan of both inputs, which at event-log scale is
    * worth skipping: time ranges are usually known (the partition
    * you're processing, the day being backfilled), so pass them.
    * Correctness never depends on the bounds — any ts outside [lo, hi]
    * still lands in a well-defined (possibly negative or > `buckets`)
    * bucket and the rescue pass orders buckets numerically — only the
    * evenness of the range split (skew resistance) does. */
  def asofJoinSkewSafe(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightPayload: Seq[String],
      buckets: Int = 32,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val (lo, hi) = bounds.getOrElse {
      // fixed-width ranges over the union ts domain (2-row driver agg)
      val b = left.select(col(tsCol).cast("long").as("t"))
        .unionAll(right.select(col(tsCol).cast("long").as("t")))
        .agg(min("t"), max("t")).head()
      if (b.isNullAt(0))
        return asofJoin(left, right, keyCol, tsCol, rightPayload) // empty inputs
      (b.getLong(0), b.getLong(1))
    }
    val width = math.max(1L, (hi - lo) / buckets + 1)
    def bucketOf(ts: org.apache.spark.sql.Column) =
      floor((ts.cast("long") - lo) / width).cast("long")

    val l2 = left.withColumn("_b", bucketOf(col(tsCol)))
    val r2 = right.withColumn("_b", bucketOf(col(tsCol)))
    val within = asofJoinKeys(l2, r2, Seq(keyCol, "_b"), tsCol, rightPayload,
      withMatchFlag = true)

    // closing right row per (key, bucket): max by the asofJoin order
    val closing = r2.groupBy(col(keyCol), col("_b"))
      .agg(max_by(
        struct(rightPayload.map(col): _*),
        struct(col(tsCol), xxhash64(struct(rightPayload.map(col): _*))))
        .as("_c"))
      .select(col(keyCol) +: col("_b") +:
        rightPayload.map(c => col(s"_c.$c").as(c)): _*)

    val matchedCols = lCols ++ rightPayload.map(c => s"asof_$c")
    val matched = within.filter(col("_matched"))
    val unmatched = within.filter(!col("_matched"))
      .select(lCols.map(col): _*)
      .withColumn("_lb", bucketOf(col(tsCol)))
    // resolve against strictly-earlier buckets: as-of on bucket number
    // (summary "ts" = _b, left "ts" = _lb - 1 → closing of any b < _lb)
    val rescue = asofJoinKeys(
      unmatched.withColumn("_t", col("_lb") - 1),
      closing.withColumn("_t", col("_b")),
      Seq(keyCol), "_t", rightPayload)
      .select(matchedCols.map(col): _*)
    matched.select(matchedCols.map(col): _*).unionByName(rescue)
  }
}
