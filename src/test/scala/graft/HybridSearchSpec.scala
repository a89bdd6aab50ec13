package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25
import graft.rag.Rag

/** BM25 keyword retrieval + RRF hybrid search. Cross-engine values
  * are driver-gated by the b1/b2 DuckDB oracles; these specs pin the
  * scoring algebra on a hand-checkable corpus and the fusion
  * semantics the oracle can't isolate. */
class HybridSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tiny = Seq(
    (1L, "spark shuffle spark"),
    (2L, "spark join join join"),
    (3L, "sort merge sort merge")).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Robertson formula") {
    val got = Bm25.score(tiny, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, df(spark)=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    // dl: 3,4,4 → avgdl = 11/3
    val idf = math.log(1.6)
    def s(tf: Int, dl: Int): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (11.0 / 3)))
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - s(2, 3)) < 1e-12)
    assert(math.abs(got(2L) - s(1, 4)) < 1e-12)
  }

  test("bm25 tf saturates: doubling tf grows score by < 2x") {
    val d = Seq((1L, "spark a a a"), (2L, "spark spark a a")).toDF("doc_id", "text")
    val m = Bm25.score(d, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(2L) > m(1L) && m(2L) < 2 * m(1L))
  }

  test("rrf sums only the rankings that contain the id") {
    val a = Seq((10L, 1), (11L, 2)).toDF("id", "rank")
    val b = Seq((11L, 1), (12L, 2)).toDF("id", "rank")
    val got = Bm25.rrfFuse(a, b, "id", c = 60, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def f(r: Int) = 1.0 / (60 + r)
    assert(math.abs(got(11L) - BigDecimal(f(2) + f(1)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(got(10L) - BigDecimal(f(1)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got.keySet == Set(10L, 11L, 12L))
  }

  test("hybrid retrieval fuses both legs and is deterministic") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(200)
    val chunks = Rag.buildChunks(docs, modelId = 1L, maxTokens = 32, dim = 64)
      .cache()
    try {
      val q = "merge sort join the fast table scan"
      val hits = Rag.searchChunksHybrid(chunks, q, topK = 10, dim = 64)
      val rows = hits.collect()
      assert(rows.length == 10)
      // every hit must come from one of the two bounded legs
      val lex = Bm25.score(chunks, "chunk_text", "id",
          q.toLowerCase.split(" ").toSeq)
        .orderBy(desc("score"), asc("id")).limit(50)
        .select("id").as[Long].collect().toSet
      val vec = graft.operators.Similarity.topK(
          chunks, "embedding", Rag.embedQuery(q, 64), 50, -1.0, Seq("id"))
        .select("id").as[Long].collect().toSet
      assert(rows.map(_.getLong(0)).forall(id => lex(id) || vec(id)))
      // deterministic across runs
      val again = Rag.searchChunksHybrid(chunks, q, topK = 10, dim = 64).collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    } finally chunks.unpersist()
  }

  test("vector mean skips nulls and ragged rows; empty group is null") {
    import graft.functions.VectorAggregates
    val mean = VectorAggregates.meanVector(2)
    val d = Seq(
      (1, Some(Array(1.0f, 2.0f))),
      (1, Some(Array(3.0f, 4.0f))),
      (1, None), // null skipped
      (2, Some(Array(9.9f))), // ragged skipped → group empty → null
      (3, Some(Array(5.0f, 6.0f)))).toDF("g", "v")
    val got = d.groupBy("g").agg(mean(col("v")).as("m"))
      .collect().map(r => r.getInt(0) ->
        Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)).toMap
    assert(got(1).get == Seq(2.0, 3.0))
    assert(got(2).isEmpty)
    assert(got(3).get == Seq(5.0, 6.0))
  }

  test("vector mean is invariant to partitioning") {
    import graft.functions.VectorAggregates
    val mean = VectorAggregates.meanVector(64)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = e.repartition(2).groupBy("label")
      .agg(mean(col("embedding")).as("m"))
      .select(col("label"), round(element_at(col("m"), 1), 9).as("m0"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val b = e.repartition(13).groupBy("label")
      .agg(mean(col("embedding")).as("m"))
      .select(col("label"), round(element_at(col("m"), 1), 9).as("m0"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(a == b)
  }

  test("vector mean matches a plain Scala reference on random groups") {
    import org.scalacheck.Gen
    import SparkTestSession.forAll
    val dim = 4
    val mean = graft.functions.VectorAggregates.meanVector(dim)
    val rowsGen = Gen.listOfN(12, for {
      g <- Gen.chooseNum(0, 2)
      v <- Gen.listOfN(dim, Gen.chooseNum(-100f, 100f))
    } yield (g, v.toArray))
    forAll(rowsGen, n = 10) { rows =>
      val got = rows.toDF("g", "v")
        .groupBy("g").agg(mean(col("v")).as("m"))
        .collect().map(r => r.getInt(0) ->
          r.get(1).asInstanceOf[scala.collection.Seq[Double]].toSeq).toMap
      rows.groupBy(_._1).foreach { case (g, vs) =>
        val expect = (0 until dim).map(i =>
          vs.map(_._2(i).toDouble).sum / vs.size)
        got(g).zip(expect).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"group $g dim mismatch")
        }
      }
    }
  }

  test("bm25 scores are invariant to row order and partitioning") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(100)
    def run(df: org.apache.spark.sql.DataFrame) =
      Bm25.score(df, "text", "doc_id", Seq("spark", "table", "merge"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(d.repartition(1))
    val b = run(d.repartition(13).sortWithinPartitions(desc("doc_id")))
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("centroid drift of two identical halves is zero") {
    import graft.functions.VectorAggregates
    val mean = VectorAggregates.meanVector(3)
    // even/odd ids carry the same vectors → halves have equal centroids
    val d = Seq(
      (0L, 1, Array(1.0f, 2.0f, 3.0f)), (1L, 1, Array(1.0f, 2.0f, 3.0f)),
      (2L, 1, Array(4.0f, 5.0f, 6.0f)), (3L, 1, Array(4.0f, 5.0f, 6.0f)))
      .toDF("vec_id", "label", "embedding")
    val ca = d.filter(col("vec_id") % 2 === 0)
      .groupBy("label").agg(mean(col("embedding")).as("ca"))
    val cb = d.filter(col("vec_id") % 2 === 1)
      .groupBy("label").agg(mean(col("embedding")).as("cb"))
    val drift = ca.join(cb, "label")
      .select(sqrt(aggregate(
        zip_with(col("ca"), col("cb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)).as("drift"))
      .head().getDouble(0)
    assert(drift == 0.0)
  }

  test("bm25 explodes only query-term occurrences, never the corpus") {
    // the filtered-explode shape: the exploded stream is bounded by
    // matches. A doc with zero matches contributes nothing.
    val d = Seq((1L, "a b c d e f g h"), (2L, "spark b")).toDF("doc_id", "text")
    val scored = Bm25.score(d, "text", "doc_id", Seq("spark"))
    assert(scored.count() == 1)
  }
}
