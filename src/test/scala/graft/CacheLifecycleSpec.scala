package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The cache-lifecycle contract (graft.Caches): operator-internal
  * persists are registered per session and freed by release(), so a
  * long-lived library caller has a leak-free path; results stay
  * correct (recomputed) when consumed again after release. */
class CacheLifecycleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = Tables.load(spark, sfDir, "documents")

  test("caching operators register cleanups; release unpersists them") {
    Caches.release(spark) // isolate from other specs sharing the session
    val before = Caches.outstanding(spark)
    assert(before == 0)
    val pairs = Dedup.simHashNearDupPairs(docs, "doc_id", "text",
      maxHamming = 10, blocks = 4)
    val n = pairs.count()
    assert(Caches.outstanding(spark) > before,
      "simHashNearDupPairs should register its shared signature cache")
    // blocks are actually resident while registered
    val cachedRdds = spark.sparkContext.getPersistentRDDs.size
    assert(cachedRdds > 0, "expected resident cached blocks before release")
    Caches.release(spark)
    assert(Caches.outstanding(spark) == 0)
    // persisted projections recompute after release: same answer, no
    // stale/missing-block failure
    assert(pairs.count() == n)
  }

  test("release is idempotent and scoped to the session") {
    Caches.release(spark)
    Caches.release(spark) // second call is a no-op, must not throw
    assert(Caches.outstanding(spark) == 0)
  }

  test("dupClusters frees per-round checkpoints; result released on demand") {
    Caches.release(spark)
    val pairs = Dedup.ngramJaccardPairs(
      docs.filter(col("doc_id") < 200), "doc_id", "text", 2, 0.4)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val clusters = Dedup.dupClusters(pairs)
    val rows = clusters.count()
    assert(rows > 0, "planted near-dups should cluster")
    // intermediate rounds were released inside the loop: at most the
    // final labels (1 checkpoint) + the operator's shared projections
    // remain beyond what existed before
    val persistedAfter = spark.sparkContext.getPersistentRDDs
      .values.count(_.getStorageLevel != StorageLevel.NONE)
    assert(persistedAfter - persistedBefore <= 3,
      s"per-round checkpoints leaked: $persistedBefore -> $persistedAfter")
    Caches.release(spark)
    // the final labels' checkpoint is gone too: re-collecting the
    // released clusters DataFrame must fail loudly (truncated lineage),
    // never silently return wrong rows
    intercept[Exception] { clusters.count() }
  }
}
