package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Scratch profiler for the t36 warm-time drift question (round 14
  * verdict #5): stage times + a plan audit that the pivoted model
  * still rides a BroadcastHashJoin (AQE must never demote it to a
  * sort-merge over the corpus token stream). */
object ProfileT36 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Tables.session("local[32]", 32)

    def run(label: String)(f: => Long): Unit = {
      for (t <- 1 to 3) {
        graft.Caches.release(spark)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        println(f"PROF $label trial$t ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
      }
    }

    val d = Tables.balanced(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("text"))
    val train = d.filter(pmod(col("doc_id"), lit(3)) === 0)

    run("train_tok_counts") {
      graft.operators.TextQueries.nbTokCounts(train).count()
    }
    run("corpus_token_explode") {
      d.select(col("doc_id"),
          explode(graft.operators.TextAnalysis.segTokens(col("text")))
            .as("tok"))
        .groupBy("doc_id").agg(count(lit(1))).count()
    }
    run("t36_full") {
      graft.SparkEntry.queries("t36_nb_langid")(spark, dir)
        .collect().length
    }

    val df = graft.SparkEntry.queries("t36_nb_langid")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("PLAN broadcast_hash_joins=" +
      "BroadcastHashJoin".r.findAllIn(p).length +
      " sort_merge_joins=" + "SortMergeJoin".r.findAllIn(p).length +
      " exchanges=" + "Exchange".r.findAllIn(p).length)
    spark.stop()
  }
}
