package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows no other row dominates —
  * here "dominates" means ≤ on the minimized column AND ≥ on the
  * maximized column, strict on at least one. The multi-objective
  * shortlist query (cheapest-yet-largest part, best quality-per-token
  * doc, …) that naive SQL writes as a correlated NOT EXISTS — an
  * O(N²) self-join no optimizer saves at scale.
  *
  * Scale shape — the sort-based linear-scan algorithm (Börzsönyi et
  * al., ICDE 2001) made distributed: a point survives iff its MAX
  * value (a) equals its minimize-group's best and (b) strictly
  * exceeds every strictly-cheaper group's best. (b) is a prefix
  * maximum over groups in minimize-key order, computed with the
  * house two-phase pattern ([[RangeBuckets]]): per-bucket running max
  * via an ordered window INSIDE each range bucket, plus a bounded
  * cross-bucket subtotal window over #buckets rows — the corpus is
  * never globally sorted in one task and never self-joined. Total
  * cost: one keyed shuffle to group, one ranged shuffle for the
  * prefix max, one keyed join back. Strictness is free after
  * grouping: within a group all rows share the minimize key, so
  * "strictly cheaper" is exactly "earlier group".
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (minimize `minCol`,
    * maximize `maxCol`). Null keys are excluded (a null coordinate
    * is incomparable under dominance). Duplicate-coordinate frontier
    * rows are all kept — none dominates another. */
  def skyline2D(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val in = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)

    // per-minimize-group best of the maximized column
    val groups = in.groupBy(col(minCol)).agg(max(col(maxCol)).as("_gmax"))

    // prefix (strictly-earlier-group) running max, two-phase:
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val bounds = RangeBuckets.boundaries(groups, Seq(minCol), parts)
    val bucketed =
      groups.withColumn("_b", RangeBuckets.bucket(Seq(col(minCol)), bounds))
    // phase 1: running max over PRECEDING rows inside each bucket
    // (one row per group value → "preceding" ≡ "strictly cheaper")
    val local = Window.partitionBy(col("_b")).orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // phase 2: per-bucket bests (tiny keyed agg), cumulative max over
    // EARLIER buckets — the unpartitioned window runs over ≤ #buckets
    // rows, bounded by construction (the house prefix-sum shape)
    val cumBuckets = bucketed
      .groupBy(col("_b")).agg(max(col("_gmax")).as("_bmax"))
      .withColumn("_bucketBase",
        max(col("_bmax")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_b"), col("_bucketBase"))
    // greatest() skips nulls, so _prefixMax is null only when NO
    // strictly-cheaper group exists — type-generic, no sentinel
    val withPrefix = bucketed
      .withColumn("_localPrefix", max(col("_gmax")).over(local))
      .join(broadcast(cumBuckets), Seq("_b"))
      .withColumn("_prefixMax",
        greatest(col("_localPrefix"), col("_bucketBase")))
      .select(col(minCol), col("_gmax"), col("_prefixMax"))

    // keep: best of its group, strictly above every cheaper group
    in.join(withPrefix, Seq(minCol))
      .filter(col(maxCol) === col("_gmax") &&
        (col("_prefixMax").isNull || col(maxCol) > col("_prefixMax")))
      .drop("_gmax", "_prefixMax")
  }

  /** Straight-line O(N²) reference for specs: dominance by definition. */
  private[graft] def naive2D(
      points: Seq[(Double, Long)]): Seq[(Double, Long)] =
    points.filterNot { case (p, s) =>
      points.exists { case (q, t) =>
        q <= p && t >= s && (q < p || t > s)
      }
    }
}
