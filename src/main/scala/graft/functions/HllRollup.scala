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

  /** Sliding-window distinct counts — the PRODUCTION form of the s21
    * query (which also computes an exact side as oracle ballast):
    * (w_start, est) per window of `hopsPerWindow` hops. The input
    * aggregates ONCE into O(hops) sketch blobs (one keyed shuffle
    * with partial aggregation); each window then unions its hops —
    * an explode of the SKETCH table, never of the input. COUNT
    * DISTINCT does not decompose over overlapping windows; sketch
    * union does, which is the whole reason this shape exists. */
  def slidingDistinct(
      df: DataFrame, tsUsCol: String, valueCol: String,
      hopUs: Long, hopsPerWindow: Int): DataFrame = {
    require(hopUs > 0 && hopsPerWindow >= 1)
    df.select(col(valueCol).as("_v"),
        org.apache.spark.sql.functions.expr(s"$tsUsCol div $hopUs")
          .as("_hop"))
      .groupBy("_hop").agg(hll_sketch_agg(col("_v")).as("sk"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.sequence(
          col("_hop") - (hopsPerWindow - 1), col("_hop"))).as("_win"),
        col("sk"))
      .groupBy("_win")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .select((col("_win") * hopUs).as("w_start"), col("est"))
  }
}
