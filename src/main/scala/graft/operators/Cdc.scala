package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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

  /** Apply an insert/update/delete changelog to a keyed snapshot —
    * the lakehouse MERGE / CDC-apply shape (Delta `MERGE INTO`,
    * Iceberg upsert, Debezium sink): for each key, the
    * HIGHEST-`seqCol` change wins; a non-delete winner's row image
    * replaces (or creates) the snapshot row, a delete winner removes
    * it, untouched snapshot rows pass through.
    *
    * Contract: `changes` = snapshot schema + `opCol` (op codes, with
    * `deleteOp` marking deletes) + `seqCol`; (key, seq) pairs must be
    * unique per key or the winner is ambiguous. Update semantics are
    * full-row upsert — an update for an absent key inserts it, the
    * standard idempotent CDC-sink behavior (partial-column updates
    * would need the old row; this shape never reads it).
    *
    * Scale shape: the changelog (small — a day's changes) takes one
    * keyed shuffle for its per-key latest-wins window; the snapshot
    * (huge) is touched by ONE anti-join on the key — shuffle-free when
    * the snapshot is bucket-written on the key (store.Bucketing), and
    * never sorted, never windowed. O(snapshot + changes log changes),
    * the same story as [[mergeRollup]]'s daily loop. */
  def applyChangelog(
      snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String, opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty)
    val expected = snapshot.columns.toSet ++ Set(seqCol, opCol)
    require(changes.columns.toSet == expected,
      s"changes schema must be snapshot + ($opCol, $seqCol): " +
        s"got ${changes.columns.toSeq}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(desc(seqCol))
    val latest = graft.Caches.shared(
      changes.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn"))
    val live = latest.filter(col(opCol) =!= deleteOp).drop(opCol, seqCol)
    snapshot
      .join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(live)
  }

  // -------------------------------------------------------------
  // Streaming face: the a34 daily loop as a structured stream
  // -------------------------------------------------------------

  private val CommitMarker = "_COMMITTED"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version dir name, batch id) of every committed state version. */
  private def committedVersions(
      spark: SparkSession, statePath: String): Seq[(String, Long)] = {
    val fs = fsOf(spark, statePath)
    val root = new org.apache.hadoop.fs.Path(statePath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        p.getName.drop(1).forall(_.isDigit) &&
        fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker)))
      .map(p => (p.getName, p.getName.drop(1).toLong))
  }

  /** The current rollup state (latest committed version), if any. */
  def readRollup(spark: SparkSession, statePath: String): Option[DataFrame] =
    committedVersions(spark, statePath).sortBy(-_._2).headOption
      .map { case (name, _) => spark.read.parquet(s"$statePath/$name") }

  /** [[mergeRollup]] as a Structured Streaming sink — the persisted-
    * state pattern the Bloom deduper (d14) established, applied to
    * aggregate maintenance: each micro-batch aggregates ITSELF (one
    * keyed shuffle over batch rows only) and is folded into a persisted
    * state table holding one row of monoid partials per key; no
    * micro-batch ever re-scans history. `aggregate` maps a static
    * batch to keyCols + partial columns — the caller uses the same
    * function for the batch face, so stream == batch is a property of
    * construction (and spec-pinned).
    *
    * State protocol (exactly-once under foreachBatch's at-least-once
    * replay): each fold writes a NEW version dir `v<batchId>` and only
    * then creates its `_COMMITTED` marker; readers and the next fold
    * use the max committed version, and a replayed batch id ≤ the
    * current version is skipped outright. The swap never deletes the
    * version it read, so a concurrent reader is never pulled out from
    * under its plan; versions older than the previous one are pruned
    * after commit. At scale each fold costs O(batch + keys), the state
    * table stays one row per key, and the stream inherits mergeRollup's
    * null-safe key semantics. */
  def streamingRollup(
      events: DataFrame,
      statePath: String,
      keyCols: Seq[String],
      aggregate: DataFrame => DataFrame,
      checkpoint: String,
      merge: (DataFrame, DataFrame, Seq[String]) => DataFrame = mergeRollup)
      : StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, statePath, keyCols, aggregate, merge)
      }
      .start()

  /** One fold of the streaming loop — also directly callable for a
    * non-streaming daily driver (same state dirs, same idempotence).
    * `merge` defaults to the additive [[mergeRollup]] monoid; any
    * associative keyed combine with the same schema contract slots in
    * (e.g. HLL sketch union — [[graft.functions.HllRollup]]) and
    * inherits the whole versioned-state protocol unchanged. */
  def foldBatch(
      batch: DataFrame, batchId: Long, statePath: String,
      keyCols: Seq[String], aggregate: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame, Seq[String]) => DataFrame = mergeRollup)
      : Unit = {
    val spark = batch.sparkSession
    val versions = committedVersions(spark, statePath)
    if (!versions.exists(_._2 >= batchId)) {
      val delta = aggregate(batch)
      val merged = readRollup(spark, statePath) match {
        case Some(state) => merge(state, delta, keyCols)
        case None => delta
      }
      val fs = fsOf(spark, statePath)
      val vdir = s"$statePath/v$batchId"
      merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(vdir)
      fs.create(new org.apache.hadoop.fs.Path(vdir, CommitMarker)).close()
      // keep the version we just read from (readers may hold it);
      // prune everything older
      val keep = versions.map(_._2).sorted.lastOption.getOrElse(-1L)
      versions.filter(_._2 < keep).foreach { case (name, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/$name"), true)
      }
    }
  }

  // -------------------------------------------------------------
  // Streaming face of applyChangelog: a change stream maintaining a
  // materialized snapshot
  // -------------------------------------------------------------

  /** The current snapshot (latest committed version), if any. */
  def readSnapshot(spark: SparkSession, statePath: String): Option[DataFrame] =
    readRollup(spark, statePath)

  /** [[applyChangelog]] as a Structured Streaming sink — the CDC-sink
    * pattern (Debezium → lakehouse table): each micro-batch of
    * changelog rows is MERGEd into a persisted snapshot under the same
    * versioned-state protocol as [[streamingRollup]] (write `v<id>`,
    * then `_COMMITTED`; replayed batch ids skip; the read version is
    * never deleted from under a reader — exactly-once materialization
    * under foreachBatch's at-least-once replay).
    *
    * Per batch the snapshot pays one anti-join and one rewrite —
    * O(snapshot) IO per fold, the copy-on-write trade every
    * non-indexed table format makes; a deployment where batches are
    * tiny relative to the table keys the snapshot store on the merge
    * key (store.Bucketing) or partitions by key range so the rewrite
    * touches only affected files. Semantics (latest-seq-wins, delete,
    * upsert) are applyChangelog's — stream == batch by construction. */
  def streamingApply(
      changes: DataFrame,
      statePath: String,
      keyCols: Seq[String], seqCol: String, opCol: String,
      checkpoint: String,
      deleteOp: String = "D"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, keyCols, seqCol, opCol, deleteOp)
      }
      .start()

  /** One fold of the CDC-apply loop — also directly callable from a
    * non-streaming daily driver (same state dirs, same idempotence). */
  def applyBatch(
      batch: DataFrame, batchId: Long, statePath: String,
      keyCols: Seq[String], seqCol: String, opCol: String,
      deleteOp: String = "D"): Unit = {
    val spark = batch.sparkSession
    val versions = committedVersions(spark, statePath)
    if (!versions.exists(_._2 >= batchId)) {
      val merged = readSnapshot(spark, statePath) match {
        case Some(snap) =>
          applyChangelog(snap, batch, keyCols, seqCol, opCol, deleteOp)
        case None =>
          // empty initial snapshot with the batch's row schema
          val empty = batch.drop(opCol, seqCol).limit(0)
          applyChangelog(empty, batch, keyCols, seqCol, opCol, deleteOp)
      }
      val fs = fsOf(spark, statePath)
      val vdir = s"$statePath/v$batchId"
      merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(vdir)
      fs.create(new org.apache.hadoop.fs.Path(vdir, CommitMarker)).close()
      val keep = versions.map(_._2).sorted.lastOption.getOrElse(-1L)
      versions.filter(_._2 < keep).foreach { case (name, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/$name"), true)
      }
    }
  }
}
