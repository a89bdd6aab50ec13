package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver's synthetic testdata
  * (TESTDATA.md): TPC-H-ish star schema + events/documents/embeddings.
  *
  * Scans are plain `spark.read.parquet` so Catalyst's vectorized reader,
  * predicate pushdown and column pruning apply — the manual
  * vertical-partition trick the reference needed
  * (reference `config/init.sql:27-38`) is subsumed by columnar pruning.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` physical type varies by testdata
    * generation: TIMESTAMP(NANOS) (readable only as long, via the
    * legacy conf; integer-divided to micros — no double round-trip,
    * ns values exceed 2^53) or a plain micros TIMESTAMP (read natively,
    * as NTZ under the default inference). This expression yields epoch
    * MICROSECONDS as BIGINT for either physical type — the session is
    * pinned UTC, so the NTZ→LTZ cast is wall-clock-identical. */
  def eventsTsMicros(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
  }

  /** Events with `ts` normalized to a microsecond TimestampType, from
    * either physical encoding (see [[eventsTsMicros]]). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        eventsTsMicros(df.schema)))
  }

  /** Session tuned for the target: AQE on, shuffle width sized to the
    * local core count (the driver passes 32 via local[32]); at cluster
    * scale the same settings defer partition sizing to AQE. */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
