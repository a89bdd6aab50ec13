package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Generative properties for the round-7 operator contracts. The
  * binary-quantized search must DEGENERATE exactly: with a candidate
  * pool covering the whole corpus, the Hamming stage selects
  * everything and the exact re-rank must reproduce the exact top-k
  * bit-for-bit. The MMR greedy is re-implemented here as a
  * straight-line immutable fold over the same Spark-rounded inputs —
  * an independent second implementation of the selection logic the
  * DuckDB oracle checks a third way (unrolled CTEs). */
class Round7PropertySpec extends AnyFunSuite {
  import SparkTestSession.forAll
  lazy val spark = SparkTestSession.spark

  private val Dim = 8
  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(Dim, Gen.chooseNum(-1.0, 1.0))

  test("binaryTopK with pool ≥ corpus ≡ exact topK (random vectors)") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.chooseNum(5, 25)
      vs <- Gen.listOfN(n, vecGen)
      q <- vecGen
    } yield (vs, q)
    forAll(caseGen, n = 5) { case (vs, q) =>
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val probe = q.toArray
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select("vec_id", "similarity").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exact = rows(Similarity.topK(df, "embedding", probe, k = 5,
        threshold = -1.0, tieBreak = Seq("vec_id")))
      val bin = rows(Similarity.binaryTopK(df, "embedding", probe, k = 5,
        pool = vs.size, tieBreak = Seq("vec_id")))
      assert(bin == exact,
        s"degenerate binaryTopK must equal exact: $bin vs $exact")
    }
  }

  test("mmrRerank ≡ straight-line immutable greedy (random vectors, λ sweep)") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.chooseNum(6, 20)
      vs <- Gen.listOfN(n, vecGen)
      q <- vecGen
      lam <- Gen.oneOf(0.3, 0.5, 0.8)
    } yield (vs, q, lam)
    forAll(caseGen, n = 5) { case (vs, q, lam) =>
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val probe = q.toArray
      val poolSize = math.min(vs.size, 8)
      val k = math.min(4, poolSize)
      val got = Similarity.mmrRerank(df, "vec_id", "embedding", probe,
          k = k, poolSize = poolSize, lambda = lam)
        .orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getDouble(3))).toSeq
      // independent straight-line reference over the SAME
      // Spark-rounded inputs (pool rel + pairwise sims)
      val pool = Similarity.topK(
        df.select(col("vec_id").as("_id"), col("embedding").as("_e")),
        "_e", probe, poolSize, threshold = -1.0, tieBreak = Seq("_id"))
      val rel = pool.select("_id", "similarity").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val a = pool.select(col("_id").as("x"), col("_e").as("ex"))
      val b = pool.select(col("_id").as("y"), col("_e").as("ey"))
      val ps = a.join(b, col("x") =!= col("y"))
        .select(col("x"), col("y"), round(graft.functions.VectorFunctions
          .cosine_similarity(col("ex"), col("ey")), 6).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      def step(sel: Vector[(Long, Double)]): Vector[(Long, Double)] = {
        val cand = rel.keySet -- sel.map(_._1)
        val scored = cand.toSeq.map { id =>
          val maxSim =
            if (sel.isEmpty) 0.0 else sel.map(s => ps((id, s._1))).max
          (id, lam * rel(id) - (1.0 - lam) * maxSim)
        }
        val best = scored.minBy { case (id, sc) => (-sc, id) }
        sel :+ best
      }
      val want = (1 to k).foldLeft(Vector.empty[(Long, Double)])(
        (sel, _) => step(sel)).toSeq
      assert(got == want, s"greedy divergence: $got vs $want")
      graft.Caches.release(spark)
    }
  }
}
