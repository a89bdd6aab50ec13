package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Ivf}

/** Scratch profiler for the d11 decision-table regression (round 7). */
object ProfileD11 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nlist = if (args.length > 1) args(1).toInt else 16
    val spark = Tables.session("local[32]", 32)
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    // train once outside timing (the sidecar amortizes this in prod)
    val model = Ivf.train(emb, "vec_id", "embedding", nlist = nlist)

    def run(label: String)(f: => Long): Unit = {
      for (t <- 1 to 3) {
        graft.Caches.release(spark)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        println(f"PROF $label trial$t ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
      }
    }

    run("old_kept_form") {
      Dedup.semanticDedupWith(emb, "vec_id", "embedding", model, 0.45)
        .select("vec_id").orderBy("vec_id").collect().length
    }
    run("pairs_only") {
      Dedup.semanticNearDupPairs(emb, "vec_id", "embedding", model, 0.45)
        .collect().length
    }
    run("new_map_form") {
      Dedup.semanticDedupMapWith(emb, "vec_id", "embedding", model, 0.45)
        .orderBy("id").collect().length
    }
    val pairs = Dedup.semanticNearDupPairs(emb, "vec_id", "embedding",
      model, 0.45).persist()
    println(s"PAIRS ${pairs.count()}")
    run("cc_labelprop") {
      Dedup.dupClusters(pairs).collect().length
    }
    run("cc_star") {
      Dedup.dupClustersStar(pairs).collect().length
    }
    spark.stop()
  }
}
