package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table co-location: the shuffle-elimination tool for
  * repeated large-fact joins (SURVEY.md build-plan scale stance).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key means every future sort-merge join between them is
  * shuffle-free AND sort-free: Spark matches bucket files pairwise.
  * At 100 TB this converts the dominant per-query cost (re-shuffling a
  * fact table on every join) into a one-time write-side cost —
  * the batch analogue of the reference's b-tree (`config/init.sql:10`).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(
      df: DataFrame, tableName: String, bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** True when the executed plan contains no shuffle exchange — the
    * property bucketed co-located joins must have. AQE wraps the real
    * plan in AdaptiveSparkPlanExec (a leaf to collect()), so recurse
    * into adaptive nodes rather than reporting vacuous truth. */
  def isShuffleFree(df: DataFrame): Boolean =
    countShuffles(df.queryExecution.executedPlan) == 0

  private def countShuffles(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        countShuffles(a.executedPlan)
    }.sum

  /** (files, partition dirs) the plan's file scans will actually read
    * after static partition pruning — the number ANN-index queries must
    * keep small relative to the index's total file count. */
  def scannedFiles(df: DataFrame): (Long, Long) = {
    def walk(plan: org.apache.spark.sql.execution.SparkPlan): Seq[(Long, Long)] =
      plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanLike =>
          Seq((f.selectedPartitions.totalNumberOfFiles,
            f.selectedPartitions.partitionCount.toLong))
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
      }.flatten
    val per = walk(df.queryExecution.executedPlan)
    (per.map(_._1).sum, per.map(_._2).sum)
  }
}
