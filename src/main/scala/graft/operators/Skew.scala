package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * A hot grouping key concentrates its rows in one reduce task and a
  * single straggler dominates the stage. Salting splits each key into
  * `buckets` sub-keys for the first (heavy) aggregation, then combines
  * the small per-salt partials — both phases are map-side-combining
  * hash aggregations, so the hot key's work spreads over `buckets`
  * tasks at the cost of one extra (tiny) shuffle.
  *
  * AQE's skew handling covers joins; skewed aggregation over
  * algebraic functions is what this utility covers. Only algebraic
  * (decomposable) aggregates are offered — sum/count/min/max — since
  * they combine losslessly from partials.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of an arbitrary
    * discriminator column (use a high-cardinality column; the salt
    * only needs to spread rows, not be uniform per key). */
  def saltCol(discriminator: Column, buckets: Int): Column =
    pmod(xxhash64(discriminator), lit(buckets.toLong)).cast("int")

  case class AlgebraicAgg(partial: Column, merge: Column => Column, name: String)
  def sumOf(c: String): AlgebraicAgg =
    AlgebraicAgg(sum(col(c)), d => sum(d), s"sum_$c")
  def countAll: AlgebraicAgg =
    AlgebraicAgg(count(lit(1)), d => sum(d), "cnt")
  def minOf(c: String): AlgebraicAgg =
    AlgebraicAgg(min(col(c)), d => min(d), s"min_$c")
  def maxOf(c: String): AlgebraicAgg =
    AlgebraicAgg(max(col(c)), d => max(d), s"max_$c")

  /** Two-phase salted aggregation, result identical to
    * `df.groupBy(keys).agg(...)` for the given algebraic aggregates. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      discriminator: Column,
      buckets: Int,
      aggs: Seq[AlgebraicAgg]): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(discriminator, buckets))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        aggs.head.partial.as(s"_p_${aggs.head.name}"),
        aggs.tail.map(a => a.partial.as(s"_p_${a.name}")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head.merge(col(s"_p_${aggs.head.name}")).as(aggs.head.name),
        aggs.tail.map(a => a.merge(col(s"_p_${a.name}")).as(a.name)): _*)
  }
}
