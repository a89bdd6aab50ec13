package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: the streaming face of the winnowing dedup
  * family (d17/d18 fingerprints as Cdc.streamingRollup versioned
  * state, stream ≡ batch pinned against the oracle-checked batch
  * queries). */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def lastVersion(statePath: String): Long =
    new java.io.File(statePath).list()
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).max

  test("streaming winnowing rollup: folded state == batch d17 table") {
    import graft.streaming.DedupStreams
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_winstream").toString
    docs.repartition(3).write.parquet(s"$tmp/src")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
    DedupStreams.streamingWinnowRollup(raw, s"$tmp/state", s"$tmp/ckpt")
      .awaitTermination()
    // several micro-batches actually folded, not one big batch
    assert(lastVersion(s"$tmp/state") >= 2)
    // the derived repeated-fingerprint table is row-identical to the
    // one-shot d17 query (the oracle-checked contract)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = DedupStreams.winnowRepeatsFromState(spark, s"$tmp/state")
    assert(streamed.isDefined, "no committed winnowing state")
    val batch = SparkEntry.queries("d17_winnowing")(spark, sfDir)
    assert(rows(streamed.get.select(col("fp"), col("n_docs"),
      col("first_doc"))) == rows(batch))
    assert(streamed.get.count() > 0, "fixture should contain repeats")
    Caches.release(spark)
  }

  test("streaming winnowing posting list: d18 pairs from state == batch d18") {
    import graft.streaming.DedupStreams
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_fpstream").toString
    docs.repartition(3).write.parquet(s"$tmp/src")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
    DedupStreams.streamingWinnowFps(raw, s"$tmp/state", s"$tmp/ckpt")
      .awaitTermination()
    assert(lastVersion(s"$tmp/state") >= 2)
    // replay idempotence: re-folding batch 0 moves nothing (the
    // versioned-state protocol skips committed batch ids)
    val before = graft.operators.Cdc.readRollup(spark, s"$tmp/state")
      .get.agg(sum("c")).head().getLong(0)
    graft.operators.Cdc.foldBatch(
      docs.limit(50), 0L, s"$tmp/state", Seq("id", "fp"),
      DedupStreams.winnowFpBatch(8, 4))
    val after = graft.operators.Cdc.readRollup(spark, s"$tmp/state")
      .get.agg(sum("c")).head().getLong(0)
    assert(before == after, "replayed batch id must be a no-op")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val streamed = DedupStreams.sharedPassagesFromState(spark, s"$tmp/state")
    assert(streamed.isDefined, "no committed posting-list state")
    val batch = SparkEntry.queries("d18_shared_passages")(spark, sfDir)
    assert(pairs(streamed.get.select("a_id", "b_id", "shared_fps",
      "containment")) == pairs(batch))
    assert(streamed.get.count() > 0, "fixture should contain shared passages")
    Caches.release(spark)
  }

  test("gcRetired removes retired-prefix sidecars, keeps live recipes") {
    val root = new java.io.File(graft.store.AnnIndexes.root)
    root.mkdirs()
    val dead = new java.io.File(root, "mh_retired_test"); dead.mkdirs()
    new java.io.File(dead, "part-0").createNewFile()
    val dead2 = new java.io.File(root, "bpe_retired_test"); dead2.mkdirs()
    val live = new java.io.File(root, "mh2_live_test"); live.mkdirs()
    val n = graft.store.AnnIndexes.gcRetired(spark)
    assert(n >= 2, s"expected >=2 retired entries removed, got $n")
    assert(!dead.exists && !dead2.exists, "retired prefixes must be deleted")
    assert(live.exists, "live recipe prefixes must survive")
    live.delete()
  }

  test("d11 derived nCells: small corpora keep 16, growth is linear in N") {
    // the formula the declared query derives its cell count from
    def nCells(n: Long) = math.max(16, ((n + 1023) / 1024).toInt)
    assert(nCells(500) == 16 && nCells(16384) == 16)
    assert(nCells(50000) == 49 && nCells(1000000) == 977)
  }
}
