package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Small-file compaction planning — the maintenance job every
  * long-lived parquet lake needs (Delta/Iceberg `OPTIMIZE`): a table
  * ingested in thousands of micro-batches accumulates thousands of
  * sub-target files per partition, and scan cost becomes dominated by
  * per-file open/footer overhead instead of bytes. The planner groups
  * each partition's files into compaction units of ~`targetBytes`, so
  * one rewrite task per group turns N tiny files into one
  * right-sized one.
  *
  * The grouping is NEXT-FIT over the size-descending file order: a
  * running byte total per partition (one window prefix sum), group =
  * preceding-total div target. Size-descending order packs the big
  * files first so the tail of small files fills remainder groups —
  * within 2× of optimal bin packing (next-fit's classic bound), fully
  * deterministic, and expressible as ONE windowed pass: no driver
  * loop, no per-file iteration, planning cost O(manifest) however
  * many million files the lake holds. Every group's total is under
  * `targetBytes` + its largest member (the straddling file stays in
  * the earlier group). A single partition with a pathological file
  * count is the usual per-key window skew story — salt or pre-split
  * by file-name range.
  */
object Compaction {

  /** Assign each manifest row a compaction group within its
    * partition. Adds `grp` (0-based, contiguous in size-descending
    * order). `manifest` columns: `partCol` (table partition the
    * rewrite must respect), `fileCol` (unique file id — also the
    * deterministic tie-break), `sizeCol` (bytes). */
  def planGroups(
      manifest: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(partCol)
      .orderBy(desc(sizeCol), asc(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .withColumn("_cum", sum(col(sizeCol)).over(w))
      .withColumn("grp",
        floor((col("_cum") - col(sizeCol)) / lit(targetBytes.toDouble))
          .cast("long"))
      .drop("_cum")
  }

  // -------------------------------------------------------------
  // Streaming face: continuous small-file arrival (round-7 item)
  // -------------------------------------------------------------

  /** Maintain the live file MANIFEST from an append stream of newly
    * written files — the real lakehouse shape, where micro-batch
    * ingest lands small files continuously and OPTIMIZE planning must
    * not re-list the lake per cycle. Each micro-batch folds its file
    * rows into [[graft.operators.Cdc.streamingRollup]] versioned state
    * keyed on (partition, file) — O(batch + manifest) per fold, never
    * a history re-scan, exactly-once under foreachBatch's
    * at-least-once replay (the v<batchId>/_COMMITTED protocol).
    *
    * Contract: each file appears ONCE across the stream's lifetime
    * (files are immutable objects; a replayed micro-batch is already
    * deduplicated by batch id). `files` columns: partCol, fileCol,
    * sizeCol (long bytes). */
  def streamingManifest(
      files: DataFrame, statePath: String,
      partCol: String, fileCol: String, sizeCol: String,
      checkpoint: String): StreamingQuery =
    graft.operators.Cdc.streamingRollup(files, statePath,
      Seq(partCol, fileCol),
      b => b.groupBy(col(partCol), col(fileCol))
        .agg(sum(col(sizeCol)).cast("long").as(sizeCol)),
      checkpoint)

  /** The CURRENT compaction plan over the streamed manifest state:
    * [[planGroups]] applied to the latest committed version. Stream ==
    * batch by construction — the state holds exactly the union of all
    * folded batches' files, so this equals planGroups over a one-shot
    * manifest of the same files (spec-pinned against p6's oracle
    * shape). None until the first fold commits. */
  def readPlan(
      spark: SparkSession, statePath: String,
      partCol: String, fileCol: String, sizeCol: String,
      targetBytes: Long): Option[DataFrame] =
    graft.operators.Cdc.readRollup(spark, statePath)
      .map(m => planGroups(m, partCol, fileCol, sizeCol, targetBytes))

  // -------------------------------------------------------------
  // Execution: plan → rewritten files (round-7 item — OPTIMIZE
  // end-to-end, not just the planning half)
  // -------------------------------------------------------------

  /** Execute a compaction: rewrite `srcDir`'s parquet into `dstDir`
    * with EXACTLY one output file per planned group, preserving the
    * table's partition layout. Returns the executed plan
    * (_part, _file, _bytes, grp) for inspection.
    *
    * How one-file-per-group is achieved with no driver loop over
    * data: the manifest comes from the scan's own `_metadata` column
    * (no separate listing job), the plan joins back broadcast (it is
    * manifest-sized), rows are hash-repartitioned on (partition,
    * group) — a collision merely puts two groups in one TASK, never
    * splits a group — and the write partitions by (partitionCols…,
    * _grp), so each group lands as exactly one file in its own _grp=N
    * subdir regardless of task assignment. A bounded driver pass then
    * flattens the _grp level away (one rename per OUTPUT file — the
    * same O(groups) driver work any commit protocol does), restoring
    * the original layout with `compact-N.parquet` names.
    *
    * At 100 TB: the shuffle moves each row once, keyed so every
    * output file is a single task's sequential write; planning and
    * the flatten are O(manifest) and O(groups). Like any in-place
    * maintenance job the dstDir-then-swap is the caller's commit
    * point — write to a versioned dir and flip a manifest pointer
    * (the streamingManifest pattern), never compact into the live
    * directory. */
  def rewrite(
      spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(srcDir)
    val partExpr =
      if (partitionCols.isEmpty) lit("")
      else concat_ws("/", partitionCols.map(c => col(c).cast("string")): _*)
    val withFile = df
      .withColumn("_file", col("_metadata.file_path"))
      .withColumn("_bytes", col("_metadata.file_size"))
      .withColumn("_part", partExpr)
    val manifest = withFile
      .groupBy("_file")
      .agg(first(col("_part")).as("_part"), first(col("_bytes")).as("_bytes"))
    val plan = planGroups(manifest, "_part", "_file", "_bytes", targetBytes)
    val planned = graft.Caches.shared(
      plan.select("_part", "_file", "_bytes", "grp"))
    withFile
      .join(broadcast(planned.select(col("_file"), col("grp").as("_grp"))),
        "_file")
      .drop("_file", "_bytes", "_part")
      .repartition(col("_grp") +: partitionCols.map(col): _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partitionCols :+ "_grp": _*)
      .parquet(dstDir)
    // flatten the synthetic _grp=N level: one rename per output file
    val fs = new org.apache.hadoop.fs.Path(dstDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def flatten(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith("_grp=")) {
          val n = name.stripPrefix("_grp=")
          fs.listStatus(st.getPath)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .foreach { f =>
              fs.rename(f.getPath,
                new org.apache.hadoop.fs.Path(dir, s"compact-$n.parquet"))
            }
          fs.delete(st.getPath, true)
        } else if (st.isDirectory) flatten(st.getPath)
      }
    flatten(new org.apache.hadoop.fs.Path(dstDir))
    planned
  }
}
