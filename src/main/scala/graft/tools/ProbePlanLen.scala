package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Measures plan-string growth of a persist-chained iterative loop —
  * the suspected pageRankConverged OOM mechanism. */
object ProbePlanLen {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session("local[4]", 4)
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 0L)).toDF("src", "dst")
    val e = edges.select(col("src").as("_src"), col("dst").as("_dst")).persist()
    val nodes = e.select(col("_src").as("id"))
      .union(e.select(col("_dst").as("id"))).distinct().persist()
    val deg = e.groupBy(col("_src").as("id")).agg(count(lit(1)).as("_deg")).persist()
    val edgesW = e.join(deg.withColumnRenamed("id", "_src"), "_src")
      .withColumn("_w", lit(1.0) / col("_deg"))
      .select("_src", "_dst", "_w").persist()
    val n = nodes.count()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    for (i <- 1 to 12) {
      val contribs = edgesW
        .join(ranks.withColumnRenamed("id", "_src"), "_src")
        .groupBy(col("_dst").as("id"))
        .agg(sum(col("rank") * col("_w")).as("_mass"))
      val stepped = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(0.15 / n) + lit(0.85) * coalesce(col("_mass"), lit(0.0))).as("rank"))
      stepped.persist(StorageLevel.MEMORY_AND_DISK)
      ranks = stepped
      // a tiny job per step, like the dangling-mass scalar
      val s = ranks.agg(sum("rank")).head().getDouble(0)
      val la = ranks.queryExecution.analyzed.treeString.length
      val lx = try ranks.queryExecution.executedPlan.treeString.length
        catch { case _: Throwable => -1 }
      println(f"PLANLEN i=$i sum=$s%.6f analyzed=$la executed=$lx")
    }
    spark.stop()
  }
}
