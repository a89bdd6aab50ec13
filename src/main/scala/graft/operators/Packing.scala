package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end in a deterministic order
  * (by id) and assign each one its starting offset in the concatenated
  * token stream, then the fixed-size context window ("pack") that
  * offset lands in — the standard pre-training step that turns a
  * ragged corpus into dense ctx-sized training examples.
  *
  * The naive formulation is a running total over the whole corpus —
  * `SUM(n_tokens) OVER (ORDER BY id)` — which Spark executes as a
  * single-partition Window: one task sorts and scans 100 TB. This
  * implementation is the classic two-phase distributed prefix sum
  * instead:
  *
  *   1. bucket rows into contiguous id ranges ([[RangeBuckets]]: a
  *      sampled-boundary bucket expression — a pure map-side function
  *      of the id, no range exchange) and compute each row's prefix
  *      WITHIN its bucket (partitioned Window — parallel, no skew);
  *   2. aggregate one subtotal row per bucket (a few hundred rows,
  *      not corpus rows), prefix-sum THAT tiny list (the only
  *      unpartitioned window, over #buckets rows), and broadcast-join
  *      the bucket base offsets back.
  *
  * Global offset = bucket base + local prefix. The result is
  * identical for ANY bucket count or boundary placement — boundaries
  * shift work between phases but never change the global order — and
  * because the bucket label is a deterministic function of the key
  * (not a runtime partition id), both plan branches agree under any
  * AQE re-planning with nothing persisted.
  */
object Packing {

  /** Adds `start_offset` (first-token position of this row in the
    * concatenated stream), `pack_id` (= start_offset / ctxSize) and
    * `n_spans` (how many ctx windows the row touches; rows longer than
    * ctxSize straddle several). `idCol` must be unique — it defines
    * the packing order. */
  def withPackOffsets(
      df: DataFrame, idCol: String, tokensCol: String,
      ctxSize: Int, numParts: Int = 0): DataFrame = {
    require(ctxSize > 0, "ctxSize must be positive")
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // The bucket label feeds BOTH the local-prefix window and the
    // subtotal aggregate, so the two branches must agree on bucket
    // assignment under ANY re-planning. `_part` is therefore a PURE
    // map-side function of the key: range boundaries are computed once
    // (one narrow sample job over idCol — what RangePartitioner does
    // internally) and frozen into the plan as broadcast literals, so
    // AQE can re-plan each branch freely and both still compute
    // identical buckets. No corpus materialization (round 5 persisted
    // the ranged frame instead, doubling the operator's IO at scale),
    // and the subtotal branch now combines map-side — only #parts
    // subtotal rows ever shuffle on that leg. Requires `df` to be
    // deterministic (both branches re-evaluate it), which every caller
    // here satisfies.
    val bounds = RangeBuckets.boundaries(df, Seq(idCol), parts)
    val parted = df.withColumn("_part",
      RangeBuckets.bucket(Seq(col(idCol)), bounds))
    // Phase 1: local prefix (exclusive) inside each id-range bucket.
    val wLocal = Window.partitionBy("_part").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_local_end", sum(col(tokensCol)).over(wLocal))
    // Phase 2: one row per bucket; the unpartitioned window runs
    // over #buckets rows, not corpus rows.
    val wParts = Window.orderBy("_part")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = parted.groupBy("_part")
      .agg(sum(col(tokensCol)).as("_part_total"))
      .withColumn("_base",
        coalesce(sum(col("_part_total")).over(wParts) - col("_part_total"), lit(0L)))
      .select("_part", "_base")
    local
      .join(broadcast(bases), "_part")
      .withColumn("start_offset", col("_base") + col("_local_end") - col(tokensCol))
      .withColumn("pack_id", floor(col("start_offset") / ctxSize))
      .withColumn("n_spans",
        when(col(tokensCol) > 0,
          floor((col("start_offset") + col(tokensCol) - lit(1)) / ctxSize)
            - col("pack_id") + lit(1))
          .otherwise(lit(1L)))
      .drop("_part", "_local_end", "_base")
  }

  /** The materialized packing plan: one row per (document, context
    * window) segment — a document spanning several ctx windows emits
    * one row per window with the token count that lands in it. This is
    * what the example writer executes: every window's segments sum to
    * exactly ctxSize (except the final window), with documents split
    * at window boundaries. Pure map stage on top of
    * [[withPackOffsets]] — the explode generates at most
    * ceil(n/ctxSize)+1 rows per doc, no extra shuffle. */
  def packSegments(
      df: DataFrame, idCol: String, tokensCol: String,
      ctxSize: Int): DataFrame =
    segmentsFromOffsets(
      withPackOffsets(df, idCol, tokensCol, ctxSize), tokensCol, ctxSize)

  /** The (document, context window) segment explode over an
    * already-offset frame (any of the `*PackOffsets` outputs) — pure
    * map work, at most ceil(n/ctxSize)+1 rows per doc. */
  private def segmentsFromOffsets(
      offsets: DataFrame, tokensCol: String, ctxSize: Int): DataFrame =
    offsets
      .filter(col(tokensCol) > 0)
      .withColumn("span_idx", explode(sequence(lit(0L), col("n_spans") - 1)))
      .withColumn("pack_id", col("pack_id") + col("span_idx"))
      .withColumn("seg_tokens",
        least(col("start_offset") + col(tokensCol),
            (col("pack_id") + 1) * ctxSize)
          - greatest(col("start_offset"), col("pack_id") * ctxSize))
      .drop("span_idx")

  /** Materialize packed training shards: the pack segments grouped
    * into shards of `packsPerShard` context windows each and written
    * `partitionBy(shard_id)` — the final sink of the packing pipeline
    * (a trainer streams one shard directory per step group). Each
    * shard holds exactly packsPerShard × ctxSize tokens of the
    * concatenated stream (the last shard less), because segments —
    * not whole documents — are assigned to shards, so a document
    * straddling a shard boundary contributes exactly its in-shard
    * tokens to each side. One repartition on shard_id bounds writer
    * memory; within-shard order is restored by (pack_id, id) sort. */
  def writeShards(
      df: DataFrame, idCol: String, tokensCol: String,
      ctxSize: Int, packsPerShard: Int, path: String): Unit = {
    require(packsPerShard > 0, "packsPerShard must be positive")
    packSegments(df, idCol, tokensCol, ctxSize)
      .withColumn("shard_id", expr(s"pack_id div $packsPerShard"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("pack_id"), col(idCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard_id")
      .parquet(path)
  }

  /** Curriculum pack offsets (round 15 — p10): within each phase,
    * rows take p4's reproducible md5-shuffled positions
    * (`md5(id||salt)` — with salt "-p9" that IS p9's curriculum_key,
    * so the schedule's order key and the packing order cannot drift)
    * and pack offsets restart at 0 per phase. Emits `phase`, `pos`,
    * `start_offset`, `pack_id`, `n_spans`, `shard_id` (= pack_id div
    * packsPerShard) per row.
    *
    * ONE generalized two-phase prefix sum, not a pass per phase (the
    * first cut looped [[withPackOffsets]] over the 4 slices and paid
    * the boundary-sample + window machinery 8×, measured 6.7 s at
    * sf0.1 — the slowest headline entry): rows bucket by sampled
    * (phase, md5, id) range boundaries, the local window partitions by
    * (phase, bucket) computing the running token sum AND the running
    * row count in one frame, and the per-(phase, bucket) subtotal
    * table — #phases × #buckets rows — prefix-sums PER PHASE before
    * broadcasting back. A bucket spanning two phases is fine: both
    * windows key on the phase, so the reset at a phase boundary is
    * structural. Never a global sort; one corpus pass. */
  def perPhasePackOffsets(
      df: DataFrame, idCol: String, tokensCol: String, phaseCol: String,
      salt: String, ctxSize: Int, packsPerShard: Int): DataFrame = {
    require(ctxSize > 0, "ctxSize must be positive")
    require(packsPerShard > 0, "packsPerShard must be positive")
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val hashed = df.withColumn("_h",
      md5(concat(col(idCol).cast("string"), lit(salt))))
    val keys = Seq(col(phaseCol), col("_h"), col(idCol))
    val bounds = RangeBuckets.boundaries(hashed, Seq(phaseCol, "_h", idCol),
      parts)
    val parted = hashed.withColumn("_part",
      RangeBuckets.bucket(keys, bounds))
    val wLocal = Window.partitionBy(phaseCol, "_part")
      .orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted
      .withColumn("_local_end", sum(col(tokensCol)).over(wLocal))
      .withColumn("_local_rn", count(lit(1)).over(wLocal))
    val wParts = Window.partitionBy(phaseCol).orderBy("_part")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = parted.groupBy(col(phaseCol), col("_part"))
      .agg(sum(col(tokensCol)).as("_pt"), count(lit(1)).as("_pc"))
      .withColumn("_tbase",
        coalesce(sum(col("_pt")).over(wParts) - col("_pt"), lit(0L)))
      .withColumn("_cbase",
        coalesce(sum(col("_pc")).over(wParts) - col("_pc"), lit(0L)))
      .select(col(phaseCol), col("_part"), col("_tbase"), col("_cbase"))
    local
      .join(broadcast(bases), Seq(phaseCol, "_part"))
      .withColumn("pos", col("_cbase") + col("_local_rn"))
      .withColumn("start_offset",
        col("_tbase") + col("_local_end") - col(tokensCol))
      .withColumn("pack_id", floor(col("start_offset") / ctxSize))
      .withColumn("n_spans",
        when(col(tokensCol) > 0,
          floor((col("start_offset") + col(tokensCol) - lit(1)) / ctxSize)
            - col("pack_id") + lit(1))
          .otherwise(lit(1L)))
      .withColumn("shard_id", expr(s"pack_id div $packsPerShard"))
      .drop("_h", "_part", "_local_end", "_local_rn", "_tbase", "_cbase")
  }

  /** Materialize the CURRICULUM shards (round 15): the per-phase
    * packing plan written `partitionBy(phase, shard_id)` — a trainer
    * streams phase 1's shard directories before phase 2's (easy→hard)
    * and within a phase reads dense ctx windows in the reproducible
    * md5 order. Same invariants as [[writeShards]], now PER PHASE:
    * every non-final shard of a phase holds exactly
    * packsPerShard × ctxSize tokens (segments, not whole documents,
    * cross shard boundaries), and shard contents are phase-monotone
    * by construction of the partitioning. One repartition on
    * (phase, shard_id) bounds writer memory. */
  def writeCurriculumShards(
      df: DataFrame, idCol: String, tokensCol: String, phaseCol: String,
      salt: String, ctxSize: Int, packsPerShard: Int, path: String): Unit = {
    require(packsPerShard > 0, "packsPerShard must be positive")
    val offsets = perPhasePackOffsets(df, idCol, tokensCol, phaseCol,
      salt, ctxSize, packsPerShard)
    segmentsFromOffsets(offsets, tokensCol, ctxSize)
      // shard_id follows the SEGMENT's window (a straddling document
      // contributes each side to its own shard), so recompute it from
      // the exploded pack_id
      .withColumn("shard_id", expr(s"pack_id div $packsPerShard"))
      .repartition(col(phaseCol), col("shard_id"))
      .sortWithinPartitions(col(phaseCol), col("shard_id"), col("pack_id"),
        col("pos"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(phaseCol, "shard_id")
      .parquet(path)
  }

  /** Per-pack roll-up: how many documents start in each ctx window,
    * their token volume, id range, and how many straddle into the next
    * window — the packing audit a data pipeline reports before
    * materializing training examples. */
  def packSummary(
      df: DataFrame, idCol: String, tokensCol: String,
      ctxSize: Int): DataFrame =
    withPackOffsets(df, idCol, tokensCol, ctxSize)
      .groupBy("pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("sum_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        sum(when(col("n_spans") > 1, 1L).otherwise(0L)).as("n_split"))
}
