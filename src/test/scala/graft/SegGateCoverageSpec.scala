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
  * fine (t1/t3 sit in the gate as whitespace canaries). Queries whose
  * seg usage hides behind a materialized sidecar scan (the plan reads
  * parquet, not the expression) can evade the scan — every current
  * one is gated; the scan exists to catch the common case of a new
  * inline seg query.
  *
  * Families scanned: t/d/b/c/u/j and the r-RAG trio — every family
  * that touches document text. Skipped: a (relational), v (vectors),
  * g (graph), p (events/pipeline), m (multimodal), s (streaming —
  * eager stream execution at construction time; their gram helpers
  * are shared with the gated batch d-queries). */
class SegGateCoverageSpec extends AnyFunSuite {

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
      val hit = usesSegTokens(df.queryExecution.analyzed)
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
