package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 g1 decomposition: how much of the headline pagerank is the
  * co-purchase pair BUILD vs the 5 rank iterations vs the final
  * top-100. Answers "is iteration count a lever at all locally".
  * Not part of the driver contract. */
object ProfileG1b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Tables.session("local[32]", 32)
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

    run("pairs_build_only") {
      graft.operators.GraphQueries.copurchasePairs(spark, dir).count()
    }
    for (iters <- Seq(0, 1, 5)) {
      run(s"g1_iters_$iters") {
        val pairs = graft.Caches.shared(
          graft.operators.GraphQueries.copurchasePairs(spark, dir))
        val edges = pairs.union(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        val ranks = graft.Caches.shared(
          graft.operators.Graph.pageRank(edges, "src", "dst", iterations = iters))
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
