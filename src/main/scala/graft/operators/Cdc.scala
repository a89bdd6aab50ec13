package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the incremental-refresh primitive of a
  * periodically re-crawled / re-exported corpus: given yesterday's and
  * today's snapshot of the same keyed table, emit (key, change_type)
  * for inserts, deletes and updates, so downstream stages (re-chunk,
  * re-embed, re-index) touch only changed documents instead of
  * reprocessing 100 TB.
  *
  * Scale shape: one full-outer shuffle join on the key — both sides
  * partition identically, and when snapshots are written bucketed by
  * the key (store.Bucketing) the join is shuffle-free. Value
  * comparison happens on a single xxhash64 of the compared columns,
  * computed in the scan projection, so wide rows don't widen the
  * shuffle: only (key, hash) moves.
  */
object Cdc {

  /** Rows that changed between `prev` and `next`, keyed by `keyCols`;
    * `compareCols` define row identity for the update check. Output:
    * keyCols ++ change_type ∈ {insert, delete, update}. */
  def snapshotDiff(
      prev: DataFrame,
      next: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val h = xxhash64(compareCols.map(col): _*)
    val p = prev.select(keyCols.map(col) :+ h.as("h_prev"): _*)
    val n = next.select(keyCols.map(col) :+ h.as("h_next"): _*)
    p.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("h_prev").isNull, "insert")
          .when(col("h_next").isNull, "delete")
          .when(col("h_prev") =!= col("h_next"), "update"))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }

  /** Incremental aggregate maintenance — fold a new batch into a
    * persisted rollup WITHOUT re-scanning history. The state table
    * holds algebraic partials per key (counts, sums — commutative
    * monoids, so merge order never matters); the batch aggregates
    * itself (map-side partials + one keyed shuffle over BATCH rows
    * only), and a full-outer merge adds partials elementwise. The
    * result provably equals re-aggregating history ∪ batch (spec +
    * oracle); averages/rates derive from the same partials downstream.
    * State size = distinct keys — the daily-rollup loop touches
    * O(batch + keys) per day instead of O(history).
    *
    * Contract: `state` and `delta` share an identical schema of
    * keyCols + numeric partial columns; absent keys on either side
    * contribute zero. The join is null-SAFE on the keys (`<=>`), so a
    * null-key partial present in both sides merges into one row —
    * matching groupBy, which treats null as one key; a plain USING
    * join would quietly keep them as two rows. */
  def mergeRollup(
      state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    require(state.columns.toSeq == delta.columns.toSeq,
      s"state/delta schema mismatch: ${state.columns.toSeq} vs ${delta.columns.toSeq}")
    val valCols = state.columns.filterNot(keyCols.contains).toSeq
    require(valCols.nonEmpty, "no partial columns to merge")
    val d = delta.columns.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"_d_$c"))
    val cond = keyCols.map(k => col(k) <=> col(s"_d_$k")).reduce(_ && _)
    state.join(d, cond, "full_outer")
      .select(
        keyCols.map(k => coalesce(col(k), col(s"_d_$k")).as(k)) ++
          valCols.map(c =>
            (coalesce(col(c), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L))).as(c)): _*)
  }
}
