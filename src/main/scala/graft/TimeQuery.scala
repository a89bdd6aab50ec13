package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual declared queries without running the
  * whole Bench headline (args: sfDir query[,query...] [trials]).
  * Same measurement discipline as Bench — cache cleared per trial,
  * full collect — so numbers are comparable. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val trials = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.quietBoundedWindowWarnings()
    for (name <- names) {
      val ts = (1 to trials).map { _ =>
        Caches.release(spark)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
