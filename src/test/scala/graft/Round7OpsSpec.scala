package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 contract specs, part 1: the s4 fast path must fire on BOTH
  * events physical encodings the driver has shipped — TIMESTAMP(NANOS)
  * (readable only as long under the legacy conf) and native micros
  * TIMESTAMP — with footer bounds scaled to µs either way, and the
  * schema probe self-contained (no ordering dependency on a prior
  * events() call having set the legacy conf).
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Writes an events-shaped parquet with a true TIMESTAMP(NANOS) ts
    * via parquet-mr directly (Spark cannot write nanos), reproducing
    * the pre-round-6 testdata generation. */
  private def writeNanosEvents(
      path: String, rows: Seq[(Long, Long, Long, String)]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser}
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |}""".stripMargin)
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withType(schema)
      .build()
    try rows.foreach { case (id, tsNanos, user, typ) =>
      val g = factory.newGroup()
      g.add("event_id", id)
      g.add("ts", tsNanos)
      g.add("user_id", user)
      g.add("event_type", typ)
      writer.write(g)
    } finally writer.close()
  }

  test("s4 footer fast path fires on both events encodings, µs-scaled") {
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    val rows = Seq(
      (1L, base + 1000000L, 7L, "click"),
      (2L, base + 2000000L, 7L, "purchase"),
      (3L, base + 3000000L, 8L, "click"),
      (4L, base + 9000000L, 8L, "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("graft_enc").toString

    // --- nanos generation: physical INT64 TIMESTAMP(NANOS) ---
    val nanosDir = s"$dir/nanos"
    new java.io.File(nanosDir).mkdirs()
    writeNanosEvents(s"$nanosDir/events.parquet",
      rows.map { case (id, us, u, t) => (id, us * 1000L, u, t) })
    // the probe must be self-contained: clear the legacy conf so a
    // bare read here would throw on TIMESTAMP(NANOS) inference
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val (nanosDf, nanosBounds) = Tables.eventsUsWithBounds(spark, nanosDir)
    assert(nanosBounds == Some((base + 1000000L, base + 9000000L)),
      s"nanos footer bounds must scale to µs, got $nanosBounds")
    assert(nanosDf.select("us").as[Long].collect().sorted.toSeq ==
      rows.map(_._2).sorted)

    // --- micros generation: native TIMESTAMP_MICROS (round-6 writer) ---
    val microsDir = s"$dir/micros"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    rows.map { case (id, us, u, t) => (id, us, u, t) }
      .toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type")
      .coalesce(1)
      .write.parquet(s"$microsDir/events.parquet")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val (microsDf, microsBounds) = Tables.eventsUsWithBounds(spark, microsDir)
    assert(microsBounds == Some((base + 1000000L, base + 9000000L)),
      s"micros footer bounds must be verbatim µs, got $microsBounds")
    assert(microsDf.select("us").as[Long].collect().sorted.toSeq ==
      rows.map(_._2).sorted)

    // both encodings feed the same skew-safe as-of and agree with the
    // single-shuffle form
    for (d <- Seq(nanosDir, microsDir)) {
      val (e, bounds) = Tables.eventsUsWithBounds(spark, d)
      assert(bounds.isDefined)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "us")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("us"), col("event_id").as("click_id"))
      val safe = graft.operators.AsOf.asofJoinSkewSafe(
        purchases, clicks, "user_id", "us",
        rightPayload = Seq("click_id"), buckets = 4, bounds = bounds)
        .orderBy("event_id").collect().toSeq
      val plain = graft.operators.AsOf.asofJoin(
        purchases, clicks, "user_id", "us", rightPayload = Seq("click_id"))
        .orderBy("event_id").collect().toSeq
      assert(safe == plain)
    }
  }

  // ---------------------------------------------------------------
  // Binary (sign-bit) quantized search — v25's operator contract
  // ---------------------------------------------------------------

  import graft.operators.{Similarity, VectorQueries}
  private val SfDir = "/root/testdata/sf0.001"
  private def embeddings = Tables.load(spark, SfDir, "embeddings")

  test("binarySignature column ≡ driver-side binarySignatureOf") {
    import spark.implicits._
    val vecs = Seq(
      Array(1.0, -1.0, 0.0, 2.0),   // 0.0 counts as non-negative
      Array(-0.5, -0.5, -0.5, -0.5),
      Array(3.0, 3.0, 3.0, 3.0))
    val got = vecs.map(_.toSeq).toDF("v")
      .select(Similarity.binarySignature(col("v"), 4))
      .as[Long].collect().toSeq
    assert(got == vecs.map(Similarity.binarySignatureOf).toSeq)
    assert(Similarity.binarySignatureOf(Array(1.0, -1.0, 0.0, 2.0)) == 13L)
  }

  test("binaryTopK: recall floor vs exact, matching similarities") {
    import spark.implicits._
    val probe = VectorQueries.probeVec
    val exact = Similarity.topK(embeddings, "embedding", probe, k = 20,
        threshold = -1.0, tieBreak = Seq("vec_id"))
      .select(col("vec_id"), col("similarity")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = Similarity.binaryTopK(embeddings, "embedding", probe,
        k = 20, pool = 100, tieBreak = Seq("vec_id"))
      .select(col("vec_id"), col("similarity")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hits = approx.keySet.intersect(exact.keySet)
    assert(hits.size >= 10, s"binary recall@20 too low: ${hits.size}/20")
    // the exact re-rank stage must produce the same rounded cosine the
    // exact path produces for every common id
    hits.foreach(id => assert(approx(id) == exact(id)))
    // guard-rail contracts
    intercept[IllegalArgumentException] {
      Similarity.binaryTopK(embeddings, "embedding", probe, k = 20,
        pool = 100, tieBreak = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Similarity.binaryTopK(embeddings, "embedding", probe, k = 20,
        pool = 10, tieBreak = Seq("vec_id"))
    }
    intercept[IllegalArgumentException] {
      Similarity.binarySignature(col("x"), 65)
    }
  }

  test("binaryTopK: both stages are bounded top-k (TakeOrderedAndProject)") {
    val plan = Similarity.binaryTopK(embeddings, "embedding",
        VectorQueries.probeVec, k = 20, pool = 100,
        tieBreak = Seq("vec_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("Exchange rangepartitioning"),
      "binaryTopK must never global-sort: " + plan.take(2000))
  }

  // ---------------------------------------------------------------
  // Compaction EXECUTION (plan → rewritten files)
  // ---------------------------------------------------------------

  test("compaction rewrite: one file per planned group, contents preserved") {
    val docs = Tables.load(spark, SfDir, "documents")
      .select("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString

    // flat table: 20 small files → a few right-sized ones
    docs.repartition(20).write.parquet(s"$tmp/flat_src")
    val totalBytes = new java.io.File(s"$tmp/flat_src").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val plan = graft.store.Compaction.rewrite(
      spark, s"$tmp/flat_src", s"$tmp/flat_dst", targetBytes = totalBytes / 3)
    val nGroups = plan.select("grp").distinct().count()
    val outFiles = new java.io.File(s"$tmp/flat_dst").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(outFiles.length == nGroups,
      s"expected exactly one file per group: ${outFiles.length} vs $nGroups")
    assert(outFiles.length < 20, "compaction must reduce the file count")
    def rows(p: String) = spark.read.parquet(p)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows(s"$tmp/flat_dst") == rows(s"$tmp/flat_src"))
    graft.Caches.release(spark)

    // partitioned table: layout preserved, per-partition grouping
    docs.repartition(10).write.partitionBy("lang")
      .parquet(s"$tmp/part_src")
    val plan2 = graft.store.Compaction.rewrite(
      spark, s"$tmp/part_src", s"$tmp/part_dst",
      targetBytes = totalBytes / 4, partitionCols = Seq("lang"))
    val perPart = plan2.groupBy("_part")
      .agg(org.apache.spark.sql.functions.countDistinct("grp").as("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perPart.foreach { case (lang, g) =>
      val dir = new java.io.File(s"$tmp/part_dst/lang=$lang")
      val n = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == g, s"partition $lang: $n files vs $g groups")
    }
    assert(rows(s"$tmp/part_dst") == rows(s"$tmp/part_src"))
    // no synthetic _grp column survives into the compacted table
    assert(!spark.read.parquet(s"$tmp/part_dst").columns.contains("_grp"))
    graft.Caches.release(spark)
  }

  // ---------------------------------------------------------------
  // MMR diversified retrieval — v26's operator contract
  // ---------------------------------------------------------------

  test("mmrRerank: rank 1 = relevance argmax; λ=1 degenerates to topK") {
    val probe = VectorQueries.probeVec
    val plain = Similarity.topK(embeddings, "embedding", probe, k = 10,
        threshold = -1.0, tieBreak = Seq("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val atLambda1 = Similarity.mmrRerank(embeddings, "vec_id", "embedding",
        probe, k = 10, poolSize = 50, lambda = 1.0)
      .orderBy("rank").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(atLambda1 == plain,
      "λ=1 MMR must reproduce the pure-relevance ranking")
    val mmr = Similarity.mmrRerank(embeddings, "vec_id", "embedding",
        probe, k = 10, poolSize = 50)
      .orderBy("rank").collect()
    assert(mmr.head.getLong(1) == plain.head,
      "first MMR pick must be the relevance argmax")
    // rank-1 score is λ·rel − (1−λ)·0 exactly
    assert(mmr.head.getDouble(3) == 0.5 * mmr.head.getDouble(2) - 0.5 * 0.0)
    assert(mmr.map(_.getLong(1)).distinct.length == 10)
  }

  test("mmrRerank diversifies: selected set's max pairwise sim drops") {
    import spark.implicits._
    val probe = VectorQueries.probeVec
    def maxPairSim(ids: Seq[Long]): Double = {
      val e = embeddings.filter(col("vec_id").isInCollection(ids))
        .select(col("vec_id").as("id"), col("embedding").as("e"))
      val a = e.select(col("id").as("a"), col("e").as("ea"))
      val b = e.select(col("id").as("b"), col("e").as("eb"))
      a.join(b, col("a") < col("b"))
        .select(round(graft.functions.VectorFunctions
          .cosine_similarity(col("ea"), col("eb")), 6).as("s"))
        .agg(max("s")).as[Double].head()
    }
    val plain = Similarity.topK(embeddings, "embedding", probe, k = 10,
        threshold = -1.0, tieBreak = Seq("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val mmr = Similarity.mmrRerank(embeddings, "vec_id", "embedding",
        probe, k = 10, poolSize = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(maxPairSim(mmr) <= maxPairSim(plain),
      "the redundancy penalty must not increase the selected set's " +
        "worst-case redundancy")
  }
}
