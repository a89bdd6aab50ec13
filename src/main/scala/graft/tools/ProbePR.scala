package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Scratch reproducer for the pageRankConverged OOM. */
object ProbePR {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session("local[4]", 4)
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 0L)).toDF("src", "dst")
    def mem(): String = {
      val r = Runtime.getRuntime
      f"${(r.totalMemory - r.freeMemory) / 1e6}%.0f MB"
    }
    for (iters <- Seq(1, 5, 20, 30)) {
      val t0 = System.nanoTime()
      val r = Graph.pageRankConverged(edges, "src", "dst", iters).collect()
      println(f"PROBE iters=$iters sum=${r.map(_.getDouble(1)).sum}%.9f " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1fs heap=${mem()}")
      graft.Caches.release(spark)
    }
    val p = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val t0 = System.nanoTime()
    val (df, it) = Graph.pageRankConvergedWithIters(
      p, "src", "dst", maxIterations = 60, damping = 0.5, tol = 1e-8)
    df.collect()
    println(f"PROBE tol ran=$it t=${(System.nanoTime() - t0) / 1e9}%.1fs heap=${mem()}")
    graft.Caches.release(spark)
    val cyc = {
      val n = 6L
      val c = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
      c.union(c.select(col("dst").as("src"), col("src").as("dst")))
    }
    val t1 = System.nanoTime()
    val r50 = Graph.pageRankConverged(cyc, "src", "dst",
      maxIterations = 50, checkpointEvery = 10).collect()
    println(f"PROBE ckpt50 sum=${r50.map(_.getDouble(1)).sum}%.9f " +
      f"t=${(System.nanoTime() - t1) / 1e9}%.1fs heap=${mem()}")
    spark.stop()
  }
}
