package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic scale-up generator for the sf1 readiness smoke
  * (round-7 stretch): replicates the driver's sf0.1 tables `reps`
  * times with key offsets, so every replica carries sf0.1's exact
  * per-replica workload structure (join fan-outs, dup clusters, skew
  * profile) and the total is `reps`× the rows. Used to validate the
  * AQE/skew story one decade up — NOT a substitute for the driver's
  * recipe (TESTDATA.md forbids touching /root/testdata; this writes a
  * scratch dir).
  *
  * Key discipline per replica i:
  *  - fact/dim keys shift by i·stride (stride > the key's max, so
  *    replicas never collide and FK integrity is preserved within a
  *    replica); region/nation stay shared dims.
  *  - documents text: replica 0 verbatim; replicas > 0 get every
  *    token suffixed `_r{i}` — shingle/fingerprint/BM25 structure is
  *    preserved WITHIN a replica with zero cross-replica overlap, so
  *    dedup workloads scale as reps independent corpora (the honest
  *    scale shape: more data, same local density).
  *  - embeddings: replica 0 verbatim; replicas > 0 remix each vector
  *    with a deterministic per-(replica, id) gaussian (α=0.5 signal,
  *    unit-normalized) — cross-replica cosine lands around α² ≈ 0.25,
  *    below the near-dup thresholds, so cells densify with mostly
  *    non-duplicate mass like a real larger corpus.
  *  - events keep their time window (reps× density — the realistic
  *    growth mode for an event stream) with user/event ids shifted.
  */
object GenScale {

  private def offsetCols(df: DataFrame, rep: Int, stride: Map[String, Long]): DataFrame =
    stride.foldLeft(df) { case (d, (c, s)) =>
      d.withColumn(c, col(c) + lit(rep.toLong * s))
    }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = Tables.session("local[32]", 32)
    // match the driver's writer: INT64 micros (INT96 would have no
    // usable footer stats for the s4 fast path)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    import spark.implicits._

    def replicate(name: String, stride: Map[String, Long],
        perRep: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = Tables.load(spark, src, name)
      val all = (0 until reps)
        .map(i => perRep(offsetCols(base, i, stride), i))
        .reduce(_ unionByName _)
      all.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"GEN $name -> ${reps}x")
    }

    // shared dims verbatim
    for (t <- Seq("region", "nation")) {
      Tables.load(spark, src, t).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$t.parquet")
    }
    val M = 10L * 1000 * 1000
    replicate("customer", Map("c_custkey" -> M))
    replicate("supplier", Map("s_suppkey" -> M))
    replicate("part", Map("p_partkey" -> M))
    replicate("orders", Map("o_orderkey" -> M, "o_custkey" -> M))
    replicate("lineitem",
      Map("l_orderkey" -> M, "l_partkey" -> M, "l_suppkey" -> M))
    // events: native micros ts kept (density grows), ids shifted
    val ev = Tables.events(spark, src)
    (0 until reps)
      .map(i => ev
        .withColumn("event_id", col("event_id") + lit(i * M))
        .withColumn("user_id", col("user_id") + lit(i * M)))
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite)
      .option("parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .parquet(s"$out/events.parquet")
    println(s"GEN events -> ${reps}x")

    // replica suffix carries a NON-ASCII letter (ř ∈ \p{L}) — the
    // scale probes exercise the Unicode tokenizer classes on every
    // replica > 0, not just ASCII-coincidental text (round-8 gate)
    replicate("documents", Map("doc_id" -> M), (d, i) =>
      if (i == 0) d
      else d.withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_ř$i"))), " "))
        // keep the driver's invariant n_chars = length(text) — stale
        // lengths would skew the quality/repetition probe workloads
        .withColumn("n_chars", length(col("text"))))

    val remix = udf { (emb: Seq[Float], id: Long, rep: Int) =>
      if (rep == 0) emb.toArray
      else {
        val r = new java.util.Random(rep * 1000003L + id)
        val mixed = emb.map(v => 0.5 * v + 0.87 * r.nextGaussian() / math.sqrt(emb.size.toDouble))
        val n = math.sqrt(mixed.map(x => x * x).sum)
        mixed.map(x => (x / math.max(n, 1e-12)).toFloat).toArray
      }
    }
    val emb = Tables.load(spark, src, "embeddings")
    (0 until reps)
      .map(i => emb
        .withColumn("embedding",
          remix(col("embedding"), col("vec_id"), lit(i)))
        .withColumn("vec_id", col("vec_id") + lit(i * M)))
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    println(s"GEN embeddings -> ${reps}x")
    spark.stop()
  }
}
