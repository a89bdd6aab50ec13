package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Round-7 contract specs, part 2: the prefix-filtered set-similarity
  * join (d16) must be EXACTLY interchangeable with the O(N²)
  * brute-force definition (it also shares d2's DuckDB oracle verbatim,
  * so the same equivalence is hash-checked cross-engine), while its
  * plan must contain no cross product — exactness WITHOUT all-pairs is
  * the operator's entire claim. The HLL rollup (a40) must satisfy
  * partial+merge ≡ direct, and the co-occurrence pair expression under
  * t34 must produce the hand-derivable pair multiset.
  */
class Round7OpsSpec2 extends AnyFunSuite {
  import SparkTestSession.forAll
  lazy val spark = SparkTestSession.spark

  // small vocab → heavy shingle overlap → non-trivial pair sets
  private val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  test("prefixJaccardJoin ≡ ngramJaccardPairs (random docs, τ sweep)") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.chooseNum(2, 14)
      texts <- Gen.listOfN(n, docGen)
      tau <- Gen.oneOf(0.2, 0.4, 0.7, 1.0)
    } yield (texts, tau)
    forAll(caseGen, n = 8) { case (texts, tau) =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val brute = rows(Dedup.ngramJaccardPairs(df, "doc_id", "text", 2, tau))
      val pref = rows(Dedup.prefixJaccardJoin(df, "doc_id", "text", 2, tau))
      assert(pref === brute, s"τ=$tau texts=$texts")
    }
  }

  test("prefixJaccardJoin plan: no cross product, no nested-loop join") {
    import spark.implicits._
    val df = (0 until 20)
      .map(i => (i.toLong, s"w$i x y z w${i % 3}"))
      .toDF("doc_id", "text")
    val out = Dedup.prefixJaccardJoin(df, "doc_id", "text", 2, 0.4)
    out.collect() // materialize so AQE finalizes the plan
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "prefix filtering must never fall back to an all-pairs join:\n" + p)
  }

  test("a40: HLL partial+merge tracks the direct pass and the exact NDV") {
    import spark.implicits._
    // NOT an equality assertion: DataSketches estimates directly-built
    // sketches with HIP and union results with the composite estimator
    // (HIP does not survive merging), so merged and direct can differ
    // by a few counts on the same registers — a40's contract is the
    // bounded-gap form, asserted here at two cardinalities.
    for (ndv <- Seq(937L, 4231L)) {
      val df = (1 to 3 * ndv.toInt)
        .map(i => (i % ndv, Seq("A", "N", "R")(i % 3)))
        .toDF("k", "g")
      val merged = df.groupBy("g").agg(hll_sketch_agg(col("k")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .head().getLong(0)
      val direct = df.agg(
          hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est"))
        .head().getLong(0)
      assert(math.abs(merged - ndv) <= ndv * 0.10, s"ndv=$ndv merged=$merged")
      assert(math.abs(direct - ndv) <= ndv * 0.10, s"ndv=$ndv direct=$direct")
      assert(math.abs(merged - direct) <= ndv * 0.05,
        s"ndv=$ndv merged=$merged direct=$direct")
    }
  }

  test("cooccurrencePairs: hand-derived pair multiset, window 2") {
    import spark.implicits._
    val out = Seq("b a c a").toDF("text")
      .select(explode(
        TextAnalysis.cooccurrencePairs(col("text"), window = 2)).as("p"))
      .select("p.w1", "p.w2")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // positions: (b,a) (b,c) (a,c) (a,a) (c,a) — each sorted
    assert(out === Seq(
      ("a", "b"), ("b", "c"), ("a", "c"), ("a", "a"), ("a", "c")))
  }

  test("cooccurrencePairs: count = 2n-3 for n≥2; none for n<2") {
    import spark.implicits._
    forAll(docGen, n = 12) { text =>
      val n = text.split(" ", -1).length
      val cnt = Seq(text).toDF("text")
        .select(explode(
          TextAnalysis.cooccurrencePairs(col("text"), window = 2)).as("p"))
        .count()
      val expected = if (n < 2) 0L else (2L * n - 3L)
      assert(cnt === expected, s"n=$n text='$text'")
    }
  }
}
