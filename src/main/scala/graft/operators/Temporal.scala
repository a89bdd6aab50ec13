package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal (SCD2) dimension join: attach to each fact row the
  * dimension VERSION whose validity interval contains the fact's
  * timestamp — the slowly-changing-dimension lookup every warehouse
  * join against a versioned dimension needs (customer tier at order
  * time, supplier contract at shipment time).
  *
  * Scale shape: an equi-join on the business key plus an interval
  * predicate. Each fact row meets only its own key's versions, so the
  * join output is |fact| × versions-per-key before the interval filter
  * trims it to exactly one row — and SCD dimensions version a handful
  * of times per key, so that blow-up is a small constant. The
  * dimension is usually broadcastable; when it is not, the join
  * shuffles both sides on the key once. For HIGH-churn keys (hundreds
  * of versions), the better shape is the as-of join on `valid_from`
  * ([[AsOf]]) — identical results when the intervals partition the
  * timeline.
  */
object Temporal {

  /** Left-join `fact` to the dimension version valid at the fact's
    * `tsCol`: `valid_from <= ts < valid_to`, with a null `valid_to`
    * meaning "current version". `factKey`/`dimKey` name the business
    * key on each side; all dimension columns except the key and the
    * validity bounds ride along. Facts with no valid version (or no
    * key match) keep null dimension columns. */
  def scd2Join(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, tsCol: String,
      fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame = {
    val d = dim.as("d")
    val f = fact.as("f")
    f.join(d,
        col(s"f.$factKey") === col(s"d.$dimKey") &&
          col(s"f.$tsCol") >= col(s"d.$fromCol") &&
          (col(s"d.$toCol").isNull || col(s"f.$tsCol") < col(s"d.$toCol")),
        "left")
      .drop(col(s"d.$dimKey"))
      .drop(col(s"d.$fromCol"))
      .drop(col(s"d.$toCol"))
  }

  /** The high-churn alternative [[scd2Join]]'s scaladoc names: the same
    * lookup as an AS-OF join on `valid_from` ([[AsOf.asofJoin]] — one
    * hash shuffle + one bounded per-key sort over |fact| + |versions|
    * rows, instead of |fact| × versions-per-key join rows). Identical
    * results (spec-pinned) when each key's validity intervals PARTITION
    * its timeline — non-overlapping, and each non-final `valid_to`
    * equal to the next version's `valid_from`. The two interval
    * shapes scd2Join resolves through its predicate are reproduced
    * explicitly:
    *  - facts before a key's first version: no prior `valid_from` →
    *    null dimension columns (asofJoin's own semantics);
    *  - a CLOSED final version (non-null `valid_to`): a synthesized
    *    null-payload tombstone row at that `valid_to`, so later facts
    *    carry nulls rather than the expired version.
    * Overlapping or gapped intervals are outside the contract (the
    * former double-matches in scd2Join itself; the latter would need a
    * tombstone per gap).
    *
    * Use this form when keys version heavily (feature-store snapshots,
    * per-entity config streams — hundreds of versions per key):
    * the interval join's small-constant blow-up stops being small,
    * while this stays one sort-merge pass; for hot-KEY skew swap in
    * [[AsOf.asofJoinSkewSafe]] on the same prepared inputs. */
  def scd2ViaAsOf(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, tsCol: String,
      fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame = {
    val payload =
      dim.columns.filterNot(Seq(dimKey, fromCol, toCol).contains).toSeq
    val versions = dim.select(
      col(dimKey).as(factKey) +: col(fromCol).as(tsCol) +:
        col(toCol).as("_vto") +: payload.map(col): _*)
    // one tombstone per key whose LATEST version is closed — under the
    // contiguity contract every earlier valid_to is shadowed by its
    // successor, so only the final interval's end needs an explicit
    // "no current version" marker
    val tombstones = versions
      .groupBy(col(factKey))
      .agg(max_by(col("_vto"), col(tsCol)).as("_vto"))
      .filter(col("_vto").isNotNull)
      .select(
        col(factKey) +: col("_vto").as(tsCol) +:
          payload.map(c =>
            lit(null).cast(dim.schema(c).dataType).as(c)): _*)
    val right = versions.drop("_vto").unionByName(tombstones)
    payload.foldLeft(
      AsOf.asofJoin(fact, right, factKey, tsCol, payload)) {
      (df, c) => df.withColumnRenamed(s"asof_$c", c)
    }
  }
}
