package graft.tools

/** Scale probe for the DECLARED d11 query with round-11's derived
  * nCells (`max(16, ceil(N/1024))`): times the full decision-table
  * query per dir (first trial pays the codebook train via the
  * sidecar; later trials are the steady state). Run ad hoc with
  * `runMain graft.tools.ProbeD11Cells [dir...]`. */
object ProbeD11Cells {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = graft.Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val n = graft.Tables.load(spark, dir, "embeddings").count()
      println(s"PROBE d11 $dir embeddings=$n " +
        s"nCells=${math.max(16, ((n + 1023) / 1024).toInt)}")
      for (t <- 1 to 3) {
        graft.Caches.release(spark); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries("d11_semantic_dedup")(spark, dir)
          .collect().length
        println(f"PROBE d11 $dir trial$t ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      }
    }
  }
}
