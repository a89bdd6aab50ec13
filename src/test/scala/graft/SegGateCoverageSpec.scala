package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Source-of-truth check for the Unicode-fixture gate list (round 12).
  *
  * The gate (UnicodeFixtureGateSpec) only protects queries LISTED in
  * `GateQueries` — a new seg-tokenized operator whose author forgets
  * the gate entry re-opens the round-10 drift window (engine and
  * oracle tokenizers diverging silently on the ASCII driver corpus).
  * This spec closes it mechanically: it builds every text-family
  * query's ANALYZED plan against sf0.001 and scans the expression
  * tree (subqueries included) for seg-token evidence — the native
  * [[graft.functions.SegTokens]] kernel or a literal
  * [[TextAnalysis.SegPattern]] regex — and fails if such a query is
  * not in the gate list.
  *
  * One-directional by design: a gated query NOT using segTokens is
  * fine (t1/t3 sit in the gate as whitespace canaries). Round 13
  * closed the documented sidecar evasion: a query whose seg usage
  * hides behind a materialized sidecar scan (the plan reads parquet,
  * not the expression) is now caught through the sidecar's
  * `_SEG_USED` stamp — `materializeAtomic` records seg-kernel
  * construction during every build window
  * ([[graft.functions.SegUsage]]) and the scan treats "plan reads a
  * stamped sidecar" exactly like "plan contains the kernel".
  * Sidecars built before round 13 carry no stamp (build-once caches
  * are never rewritten in place) — they re-stamp on their next
  * natural rebuild (recipe bump, regenerated corpus, GC).
  *
  * Families scanned: t/d/b/c/u/j and the r-RAG trio — every family
  * that touches document text. Skipped: a (relational), v (vectors),
  * g (graph), p (events/pipeline), m (multimodal), s (streaming —
  * eager stream execution at construction time; their gram helpers
  * are shared with the gated batch d-queries). */
class SegGateCoverageSpec extends AnyFunSuite {
  import SegGateCoverageSpec.readsSegSidecar

  private val sf = "/root/testdata/sf0.001"

  private def usesSegTokens(plan: LogicalPlan): Boolean = {
    def exprHasSeg(e: Expression): Boolean =
      e.collectFirst {
        case _: graft.functions.SegTokens => true
        case Literal(v, _)
            if v != null && v.toString == TextAnalysis.SegPattern => true
      }.nonEmpty
    plan.collectWithSubqueries {
      case p if p.expressions.exists(exprHasSeg) => true
    }.nonEmpty
  }

  test("every seg-tokenized text/dedup query is in the gate list") {
    assume(new java.io.File(s"$sf/documents.parquet").exists,
      s"no testdata at $sf")
    val s = SparkTestSession.spark
    val candidates = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      "tdbcuj".contains(n.head) && n.drop(1).headOption.exists(_.isDigit) ||
        n.startsWith("r1_") || n.startsWith("r2_") || n.startsWith("r3_")
    }
    assert(candidates.size > 60, s"family filter broke: $candidates")
    val seg = candidates.filter { name =>
      val df = SparkEntry.queries(name)(s, sf)
      val plan = df.queryExecution.analyzed
      val hit = usesSegTokens(plan) || readsSegSidecar(s, plan)
      // constructing some queries registers shared caches / builds
      // sidecars — release so the scan doesn't accumulate state
      Caches.release(s)
      s.catalog.clearCache()
      hit
    }
    // sanity: the scan itself must see the known seg family, else a
    // refactor of the kernel class would make this spec pass vacuously
    assert(seg.contains("t5_top_bigrams") && seg.contains("d2_ngram_jaccard"),
      s"plan scan found no seg usage where it is known to exist: $seg")
    val unGated = seg.filterNot(UnicodeFixtureGateSpec.GateQueries)
    assert(unGated.isEmpty,
      s"seg-tokenized queries missing from UnicodeFixtureGateSpec." +
        s"GateQueries (add them so the fixture gate covers them): " +
        unGated.mkString(", "))
  }
}

object SegGateCoverageSpec {
  /** True when `plan` scans a parquet sidecar under the index store
    * whose BUILD tokenized with the seg kernel (the `_SEG_USED` stamp
    * — see [[graft.functions.SegUsage]]). The stamp lives in the
    * TOP-LEVEL sidecar dir under the store root, so nested model/
    * partition paths resolve up to it. */
  def readsSegSidecar(
      s: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): Boolean = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val rootAbs =
      new java.io.File(graft.store.AnnIndexes.root).getAbsolutePath
    plan.collectWithSubqueries {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toUri.getPath)
        case _ => Seq.empty[String]
      }
    }.flatten.exists { p =>
      val abs = new java.io.File(p).getAbsolutePath
      abs.startsWith(rootAbs + "/") && {
        val top = abs.stripPrefix(rootAbs + "/").split("/")(0)
        graft.store.AnnIndexes.usesSeg(s, s"$rootAbs/$top")
      }
    }
  }
}
