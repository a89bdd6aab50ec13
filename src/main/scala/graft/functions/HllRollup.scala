package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Cdc

/** Continuously-maintained distinct counts via mergeable HLL sketches —
  * the streaming face of the a40 rollup: per-key sketch blobs are the
  * persisted state, each micro-batch contributes one `hll_sketch_agg`
  * partial, and the fold is `hll_union` instead of addition. Everything
  * else — versioned state dirs, commit markers, replayed-batch
  * idempotence, O(batch + keys) per fold — is inherited verbatim from
  * [[Cdc.streamingRollup]] through its pluggable merge seam; there is
  * NO sketch-specific state protocol (the CountMin precedent, for a
  * combine that is union-not-sum).
  *
  * Where the additive rollup's replay safety leans on zero-valued
  * deltas, the sketch fold's lean is stronger: HLL union is IDEMPOTENT
  * (register-wise max), so even a hypothetical double-fold of the same
  * batch could not inflate the estimate — and the versioned protocol
  * skips replays outright anyway.
  *
  * Estimates read from the state are UNION-side estimates (composite
  * estimator) — see a40's Scaladoc for why they can differ by a few
  * counts from a direct single-pass sketch while staying inside the
  * sketch's error envelope.
  */
object HllRollup {

  /** Per-batch partial: one sketch blob per key. */
  def sketchBatch(keyCols: Seq[String], valueCol: String)(
      batch: DataFrame): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sk"))

  /** Keyed sketch merge: full-outer on the keys (null-safe, matching
    * [[Cdc.mergeRollup]]'s contract), `hll_union` where both sides
    * hold a sketch, pass-through where only one does. */
  def mergeSketches(
      state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    require(state.columns.toSeq == delta.columns.toSeq,
      s"state/delta schema mismatch: ${state.columns.toSeq} vs ${delta.columns.toSeq}")
    val d = delta.columns.foldLeft(delta)(
      (df, c) => df.withColumnRenamed(c, s"_d_$c"))
    val cond = keyCols.map(k => col(k) <=> col(s"_d_$k")).reduce(_ && _)
    def merged(c: String): Column =
      when(col(c).isNull, col(s"_d_$c"))
        .when(col(s"_d_$c").isNull, col(c))
        .otherwise(hll_union(col(c), col(s"_d_$c")))
    state.join(d, cond, "full_outer")
      .select(
        keyCols.map(k => coalesce(col(k), col(s"_d_$k")).as(k)) :+
          merged("sk").as("sk"): _*)
  }

  /** Maintain per-key NDV sketches over an append stream — the
    * continuous form of a40's batch rollup. */
  def streamingNdv(
      events: DataFrame, statePath: String, keyCols: Seq[String],
      valueCol: String, checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(events, statePath, keyCols,
      sketchBatch(keyCols, valueCol), checkpoint, mergeSketches)

  /** Current per-key estimates from the persisted sketch state. */
  def estimates(spark: SparkSession, statePath: String,
      keyCols: Seq[String]): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      st.select(keyCols.map(col) :+
        hll_sketch_estimate(col("sk")).as("ndv_est"): _*))
}
