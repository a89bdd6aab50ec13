package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOf

/** Scratch profiler for the s4 regression (round-7 item 1). Times each
  * ingredient of s4_asof_skewsafe separately so the regression's locus
  * (footer probe, events normalization, two-phase plan) is measurable
  * rather than guessed. Not part of the driver contract.
  */
object ProfileS4 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.quietBoundedWindowWarnings()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }

    // warm up JVM/codegen on an unrelated query
    Tables.events(spark, dir).count()

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("schema_probe") {
        Tables.load(spark, dir, "events").schema("ts").dataType
      }
      time("footer_bounds") {
        graft.store.ParquetStats.longColumnBounds(spark, s"$dir/events.parquet", "ts")
      }
      time("events_count") { Tables.events(spark, dir).count() }
      time("events_us_count") {
        Tables.events(spark, dir)
          .withColumn("us", unix_micros(col("ts"))).agg(avg("us")).collect()
      }
      val bounds = graft.store.ParquetStats
        .longColumnBounds(spark, s"$dir/events.parquet", "ts")
      println(s"bounds=$bounds")
      def legs() = {
        val e = Tables.events(spark, dir).withColumn("us", unix_micros(col("ts")))
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "us")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("click_id"))
        (purchases, clicks)
      }
      time("s3_plain_asof") {
        val (p, c) = legs()
        AsOf.asofJoin(p, c, "user_id", "us", rightPayload = Seq("click_id"))
          .orderBy("event_id").collect()
      }
      time("s4_with_bounds") {
        val (p, c) = legs()
        AsOf.asofJoinSkewSafe(p, c, "user_id", "us",
          rightPayload = Seq("click_id"), buckets = 16, bounds = bounds)
          .orderBy("event_id").collect()
      }
      time("s4_scan_bounds") {
        val (p, c) = legs()
        AsOf.asofJoinSkewSafe(p, c, "user_id", "us",
          rightPayload = Seq("click_id"), buckets = 16, bounds = None)
          .orderBy("event_id").collect()
      }
      time("s4_full_query") {
        graft.SparkEntry.queries("s4_asof_skewsafe")(spark, dir).collect()
      }
    }
    spark.stop()
  }
}
