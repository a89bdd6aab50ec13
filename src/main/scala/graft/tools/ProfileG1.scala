package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scratch profiler for g1's per-iteration rank-join strategy
  * (round-7 headline-hygiene item): measures the shipped plan
  * (AQE-chosen broadcast of the O(V) rank table per step) against a
  * variant that pins the rank join to a shuffle-hash join on the
  * cached edge partitioning (`Graph.scala` prescribes pre-partitioning
  * on _src for cluster-scale V). Not part of the driver contract.
  */
object ProfileG1 {

  /** pageRank with the per-iteration join strategy pinned via hint. */
  private def pageRankHinted(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, hint: Option[String]): DataFrame = {
    val deg = graft.Caches.shared(
      edges.groupBy(col(srcCol).as("id"))
        .agg(count(lit(1)).as("_deg")))
    val edgesW = graft.Caches.shared(
      edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
        .join(deg.withColumnRenamed("id", "_src"), "_src")
        .withColumn("_w", lit(1.0) / col("_deg"))
        .select("_src", "_dst", "_w"))
    val n = deg.count()
    var ranks = deg.select(col("id"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iterations) {
      val r = hint.map(h => ranks.hint(h)).getOrElse(ranks)
      val next = edgesW
        .join(r.withColumnRenamed("id", "_src"), "_src")
        .groupBy(col("_dst").as("id"))
        .agg(sum(col("rank") * col("_w")).as("_mass"))
        .select(col("id"),
          (lit(0.15 / n) + lit(0.85) * col("_mass")).as("rank"))
      ranks = if (i < iterations) graft.Caches.shared(next) else next
    }
    ranks
  }

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

    def run(label: String)(f: => Unit): Unit = {
      for (t <- 1 to 3) {
        graft.Caches.release(spark)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        println(f"PROF $label trial$t ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }

    run("g1_shipped") {
      graft.SparkEntry.queries("g1_part_pagerank")(spark, dir).collect()
    }
    run("g1_converged_lazy") {
      val pairs = graft.Caches.shared(
        graft.operators.GraphQueries.copurchasePairs(spark, dir))
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val ranks = graft.operators.Graph.pageRankConverged(
        edges, "src", "dst", maxIterations = 5, checkpointEvery = 5)
      ranks
        .crossJoin(broadcast(ranks.agg(count(lit(1)).as("_n"))))
        .select(col("id").as("part_id"),
          round(col("rank") * col("_n"), 6).as("rank_scaled"))
        .orderBy(desc("rank_scaled"), asc("part_id"))
        .limit(100).collect()
    }
    for (hint <- Seq(None, Some("shuffle_hash"), Some("merge"))) {
      run(s"g1_hint_${hint.getOrElse("aqe_default")}") {
        val pairs = graft.Caches.shared(
          graft.operators.GraphQueries.copurchasePairs(spark, dir))
        val edges = pairs.union(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        val ranks = graft.Caches.shared(
          pageRankHinted(edges, "src", "dst", 5, hint))
        ranks
          .crossJoin(broadcast(ranks.agg(count(lit(1)).as("_n"))))
          .select(col("id").as("part_id"),
            round(col("rank") * col("_n"), 6).as("rank_scaled"))
          .orderBy(desc("rank_scaled"), asc("part_id"))
          .limit(100).collect()
      }
    }
    spark.stop()
  }
}
