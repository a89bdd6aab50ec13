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
}
