package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache lifecycle for operator-internal persists.
  *
  * Several operators persist a shared projection that feeds 2+ join
  * branches of the plan they RETURN (the DAG-branch-recompute fix:
  * Spark re-evaluates a subtree per consumer, so an unshared shingle /
  * signature pass would run once per branch). The returned plan depends
  * on those cached blocks, so the operator itself cannot unpersist —
  * that is the caller's moment to choose. This registry is the
  * unpersist path: every operator-internal persist is recorded against
  * its session, and callers release them all once the consuming action
  * has run.
  *
  * Contract for library users:
  *  - each call to a caching operator (`Dedup.minHashNearDupPairs`,
  *    `simHashNearDupPairs`, `embeddingNearDupPairs`, the tf-idf /
  *    surprise queries) registers its intermediates here;
  *  - after materializing the returned DataFrame (collect/write), call
  *    `Caches.release(spark)` — a long-lived session that never
  *    releases accumulates one cached projection per operator call;
  *  - re-using the returned DataFrame AFTER release is still correct
  *    (Spark recomputes the unpersisted subtree), just slower;
  *  - the `*FromIndex` forms avoid session caching entirely (the
  *    shared work lives in a materialized parquet index) — prefer them
  *    in long-lived services.
  *
  * `Bench`/`Verify` reset via `spark.catalog.clearCache()` between
  * queries, which drops the same blocks; `release` additionally runs
  * non-persist cleanups (e.g. localCheckpoint block frees) and empties
  * the registry.
  *
  * Lifecycle safety net: the registry would otherwise hold strong
  * references to a session (and every registered plan) forever if the
  * app stops the session without releasing; a SparkListener installed
  * at first registration drops the session's entries on
  * ApplicationEnd.
  */
object Caches {

  private val registry = TrieMap.empty[SparkSession, ArrayBuffer[() => Unit]]

  /** Persist `df` (MEMORY_AND_DISK) and register its unpersist with
    * the owning session. Returns `df` for chaining. */
  def shared(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    registerCleanup(df.sparkSession)(() => { df.unpersist(blocking = false); () })
    df
  }

  /** Register an arbitrary cleanup to run at `release(spark)` — used
    * for resources `unpersist` alone cannot free (localCheckpoint
    * blocks held by a returned result). */
  def registerCleanup(spark: SparkSession)(f: () => Unit): Unit =
    registry.synchronized {
      val buf = registry.get(spark) match {
        case Some(b) => b
        case None =>
          // First registration for this session: drop its entries when
          // the underlying context stops, so an app that stops a
          // session without calling release doesn't retain the session
          // (and every registered plan) through this registry forever.
          // The cleanups are not RUN at that point — the context's
          // cached blocks die with it; only the references are dropped.
          val b = ArrayBuffer.empty[() => Unit]
          registry.put(spark, b)
          spark.sparkContext.addSparkListener(
            new org.apache.spark.scheduler.SparkListener {
              override def onApplicationEnd(
                  e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
                registry.synchronized { registry.remove(spark) }
                ()
              }
            })
          b
      }
      buf += f
    }

  /** Run and drop every cleanup registered against `spark`. Safe to
    * call repeatedly; cleanups are idempotent unpersists. */
  def release(spark: SparkSession): Unit = {
    val fs = registry.synchronized { registry.remove(spark) }
    fs.foreach(_.foreach(f => f()))
  }

  /** Number of outstanding cleanups for `spark` (spec hook). */
  def outstanding(spark: SparkSession): Int =
    registry.synchronized { registry.get(spark).map(_.size).getOrElse(0) }
}
