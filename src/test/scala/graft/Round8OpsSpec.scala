package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** In-JVM probe for the retry spec: local-mode tasks run in this JVM,
  * so a static counter observes injected failures that accumulators
  * would drop (failed-task accumulator updates are discarded). */
object RetryProbe {
  val fails = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Round-8 hardening specs: star-contraction ≡ min-label CC on random
  * pair graphs (semanticDedup now defaults to the O(log n) star form),
  * d16's size-DERIVED broadcast-vs-shuffle decision for the shingle-df
  * table, and ingest determinism under task retries. */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("id").cast("long"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("dupClustersStar ≡ dupClusters on seeded random pair graphs") {
    // shapes that stress both algorithms: sparse random (forest-ish),
    // dense random (big components), and a long chain spliced with
    // random chords (deep diameter — the case star contraction exists
    // for). Same RNG seeds every run.
    val cases = Seq(
      (11L, 200, 80), // sparse: mostly small components + singleton pairs
      (13L, 120, 300), // dense: a giant component
      (17L, 400, 60)) // sparse over a wider id space
    for ((seed, nIds, nEdges) <- cases) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(nEdges) {
        val a = rnd.nextInt(nIds).toLong
        val b = rnd.nextInt(nIds).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
        .toDF("a_id", "b_id")
      val viaStar = labelMap(Dedup.dupClustersStar(pairs))
      val viaProp = labelMap(Dedup.dupClusters(pairs))
      assert(viaStar == viaProp, s"seed=$seed")
      Caches.release(spark)
    }
    // the deep-chain case: 0-1-2-...-149 plus a few chords
    val chain = ((0L until 149L).map(i => (i, i + 1)) ++
      Seq((10L, 100L), (30L, 120L))).toDF("a_id", "b_id")
    // min-label needs O(diameter) ≈ 150 rounds here — exactly the
    // shape the star default exists for (star converges well inside
    // its default 25)
    val s = labelMap(Dedup.dupClustersStar(chain))
    val p = labelMap(Dedup.dupClusters(chain, maxIters = 200))
    assert(s == p && s.values.toSet == Set(0L))
    Caches.release(spark)
  }

  test("d16 df-table join is size-derived: broadcast small vocab, shuffle large") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 300)
    def planOf(): String = {
      val df = Dedup.prefixJaccardJoin(docs, "doc_id", "text",
        n = 3, threshold = 0.6)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // default threshold (10 MB): the sf0.001 shingle vocabulary fits
    // comfortably -> the df table must broadcast
    val small = planOf()
    assert(small.contains("BroadcastHashJoin"), small.take(2000))
    Caches.release(spark)
    // a corpus whose vocabulary exceeds the session's broadcast budget
    // (modeled by shrinking the budget under the SAME real fixture —
    // the decision reads vocab_rows * 24 > threshold either way):
    // the hint must NOT be forced; the df join falls back to shuffle
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024")
      val large = planOf()
      // the tok-keyed df join must not be a forced broadcast: with a
      // 1 KB budget Catalyst can't legally plan ANY broadcast hash
      // join, so a surviving one would mean the hardcoded hint is back
      assert(!large.contains("BroadcastHashJoin"), large.take(2000))
      assert(large.contains("SortMergeJoin") || large.contains("ShuffledHashJoin"),
        large.take(2000))
    } finally {
      spark.conf.set(key, prev)
      Caches.release(spark)
    }
  }

  test("balanced reads plan partitions without an RDD conversion") {
    // single parquet file -> fewer planned partitions than cores ->
    // repartition to defaultParallelism; an already-wide frame is
    // returned untouched (same object, no Exchange added)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = spark.sparkContext.defaultParallelism
    val narrow = org.apache.spark.sql.GraftShim.planPartitions(docs)
    if (narrow < target)
      assert(org.apache.spark.sql.GraftShim.planPartitions(
        Tables.balanced(docs)) == target)
    val wide = docs.repartition(target)
    assert(Tables.balanced(wide) eq wide)
  }

  test("dupClustersAuto ≡ both distributed forms, branch forced each way") {
    val rnd = new scala.util.Random(41L)
    val pairs = Seq.fill(250) {
      val a = rnd.nextInt(120).toLong; val b = rnd.nextInt(120).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("a_id", "b_id")
    val viaProp = labelMap(Dedup.dupClusters(pairs))
    Caches.release(spark)
    // small branch (driver union-find): default broadcast budget
    val viaAutoSmall = labelMap(Dedup.dupClustersAuto(pairs))
    Caches.release(spark)
    assert(viaAutoSmall == viaProp)
    // large branch (star contraction): shrink the budget below the
    // pair count so the same data takes the distributed path
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val viaAutoLarge = try {
      spark.conf.set(key, "64")
      labelMap(Dedup.dupClustersAuto(pairs))
    } finally { spark.conf.set(key, prev); Caches.release(spark) }
    assert(viaAutoLarge == viaProp)
  }

  test("winnowing: selection guarantee, density bound, reference equality") {
    val (k, w) = (8, 4)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // reference implementation: the paper's algorithm, plainly —
    // tokenized with the same script-aware segmentation the engine
    // kernel uses (round 9: 世界 is TWO per-char tokens, not one word)
    def segRef(text: String): Array[String] = {
      val m = java.util.regex.Pattern
        .compile(graft.operators.TextAnalysis.SegPattern).matcher(text)
      Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => m.group()).toArray
    }
    // round 10: the gram hash is the int64 md5 slice (first 15 hex
    // digits) — the reference mirrors Dedup.md5Long exactly
    def md5long(s: String): Long = BigInt(md5hex(s).take(15), 16).toLong
    def ref(text: String): Set[Long] = {
      val toks = segRef(text)
      val grams =
        if (toks.length <= k) Array(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toArray
      val hs = grams.map(md5long)
      val wins =
        if (hs.length <= w) Array(hs)
        else hs.sliding(w).toArray
      wins.map(_.min).toSet
    }
    val rnd = new scala.util.Random(29L)
    val vocab = Vector("the", "data", "engine", "spark", "merge", "join",
      "café", "straße", "世界", "row")
    def randDoc(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // guarantee: an 11-token (w+k-1) shared run between two otherwise
    // different documents always yields a shared fingerprint
    val run = randDoc(k + w - 1)
    val a = randDoc(30) + " " + run + " " + randDoc(25)
    val b = randDoc(17) + " " + run + " " + randDoc(40)
    assert(ref(a).intersect(ref(b)).nonEmpty)
    // engine == reference on the guarantee pair + random docs
    val samples = Seq(a, b, randDoc(3), randDoc(k), randDoc(k + w - 2),
      randDoc(60), randDoc(200))
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .winnowFingerprints(df, "doc_id", "text", k, w)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    samples.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"doc $i")
      // density: never more fingerprints than windows
      val nGrams = math.max(segRef(t).length - k + 1, 1)
      assert(got(i.toLong).size <= math.max(nGrams - w + 1, 1))
    }
    // and the engine pair shares the guaranteed fingerprint
    assert(got(0L).intersect(got(1L)).nonEmpty)
  }

  test("ingest store is bit-identical under injected first-attempt task failures") {
    // the README claim under test: chunk ids are retry/speculation-safe
    // deterministic composites — so a run where EVERY task's first
    // attempt dies (and Spark retries it) must produce a bit-identical
    // store. Requires task retries: SparkTestSession runs local[4, 2].
    assume(spark.sparkContext.master.contains(","),
      "needs a maxFailures>1 master")
    val tmp = java.nio.file.Files.createTempDirectory("graft_retry").toString
    // through parquet, NOT the in-memory demo corpus: a LocalRelation
    // is folded driver-side by ConvertToLocalRelation (TaskContext is
    // null there — no tasks, nothing to retry); a file scan makes
    // every downstream stage real executor work
    graft.cli.Demo.demoCorpus(spark).write.parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    graft.cli.Demo.importDocs(spark, docs, s"$tmp/clean",
      "graft/test-model", 64, 32)
    RetryProbe.fails.set(0)
    val flaky = udf { (t: String) =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        RetryProbe.fails.incrementAndGet()
        throw new RuntimeException("injected first-attempt task failure")
      }
      t
    }
    graft.cli.Demo.importDocs(spark,
      docs.withColumn("text", flaky(col("text"))), s"$tmp/flaky",
      "graft/test-model", 64, 32)
    assert(RetryProbe.fails.get() > 0, "injection never fired")
    // normalize the one legitimately run-scoped field (import_date is
    // captured once on the DRIVER per run — not retry-sensitive)
    def canon(store: String): Seq[String] =
      spark.read.parquet(s"$store/chunks")
        .withColumn("metadata",
          map_filter(col("metadata"), (k, _) => k =!= "import_date"))
        .select("id", "source_id", "model_id", "chunk_number",
          "chunk_size", "chunk_text", "embedding", "metadata")
        .collect().map(_.toString).sorted.toIndexedSeq
    assert(canon(s"$tmp/clean") == canon(s"$tmp/flaky"))
    def ids(store: String, table: String): Seq[String] =
      spark.read.parquet(s"$store/$table").collect()
        .map(_.toString).sorted.toIndexedSeq
    assert(ids(s"$tmp/clean", "models") == ids(s"$tmp/flaky", "models"))
    assert(ids(s"$tmp/clean", "sources") == ids(s"$tmp/flaky", "sources"))
  }

  test("d16 pairs unchanged by the join-strategy fallback") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 200)
    def run(): Set[(Long, Long)] = {
      val r = Dedup.prefixJaccardJoin(docs, "doc_id", "text",
        n = 3, threshold = 0.6)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Caches.release(spark)
      r
    }
    val viaBcast = run()
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val viaShuffle = try { spark.conf.set(key, "1024"); run() }
      finally spark.conf.set(key, prev)
    assert(viaBcast == viaShuffle && viaBcast.nonEmpty)
  }
}
