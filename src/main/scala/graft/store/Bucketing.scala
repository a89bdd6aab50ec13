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
    * property bucketed co-located joins must have. */
  def isShuffleFree(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty
}
