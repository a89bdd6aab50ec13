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
}
