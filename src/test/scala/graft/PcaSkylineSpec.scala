package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventQueries, Pca, Skyline, TextAnalysis}

/** PCA fit/transform contracts, distributed-skyline equivalence, and
  * the interval-union / vocab-coverage mechanics (round 6: v24, a39,
  * s18, t32). */
class PcaSkylineSpec extends AnyFunSuite {
  import SparkTestSession.forAll
  lazy val spark = SparkTestSession.spark

  // ---------------------------------------------------------- PCA --

  test("symEig recovers a known 2x2 eigensystem") {
    val (eig, vecs) = Pca.symEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = eig.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector check: A·v = λ·v
    eig.indices.foreach { i =>
      val v = vecs(i)
      val av = Array(2.0 * v(0) + v(1), v(0) + 2.0 * v(1))
      assert(math.abs(av(0) - eig(i) * v(0)) < 1e-10)
      assert(math.abs(av(1) - eig(i) * v(1)) < 1e-10)
    }
  }

  test("symEig converges at any magnitude (relative threshold)") {
    // the round-7 ADVICE fix: an absolute off() cutoff returns
    // identity "eigenvectors" for tiny-magnitude matrices (entries
    // below sqrt(1e-22)) and burns all sweeps for large ones — the
    // relative threshold must diagonalize both to relative precision
    for (scale <- Seq(1e-14, 1.0, 1e12)) {
      val (eig, vecs) = Pca.symEig(Array(
        Array(2.0 * scale, 1.0 * scale),
        Array(1.0 * scale, 2.0 * scale)))
      val sorted = eig.sorted
      assert(math.abs(sorted(0) - 1.0 * scale) < 1e-10 * scale,
        s"scale $scale: λ_min ${sorted(0)}")
      assert(math.abs(sorted(1) - 3.0 * scale) < 1e-10 * scale,
        s"scale $scale: λ_max ${sorted(1)}")
      // rotations must actually have happened: eigenvectors are
      // ±(1,1)/√2 and ±(1,−1)/√2, never the identity basis
      vecs.foreach { v =>
        assert(math.abs(math.abs(v(0)) - math.abs(v(1))) < 1e-9,
          s"scale $scale: vector ${v.toSeq} is not a rotated basis")
      }
    }
  }

  /** Deterministic synthetic corpus with a dominant direction. */
  private def synthetic(dim: Int, n: Int): Seq[(Long, Array[Float])] = {
    val dom = Array.tabulate(dim)(i => math.sin(i + 1.0))
    val nrm = math.sqrt(dom.map(x => x * x).sum)
    val d = dom.map(_ / nrm)
    (0 until n).map { r =>
      val rng = new scala.util.Random(r * 7919L)
      val coef = 10.0 * math.sin(r * 0.7)
      val v = Array.tabulate(dim)(i =>
        (coef * d(i) + 0.3 * rng.nextGaussian() + 2.0).toFloat)
      (r.toLong, v)
    }
  }

  test("fit: components orthonormal, eigenvalues descending, dominant direction found") {
    import spark.implicits._
    val dim = 16
    val df = synthetic(dim, 200).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim, 4)
    assert(m.n == 200)
    assert(m.eigenvalues.length == 4 && m.components.length == 4)
    // descending eigenvalues
    m.eigenvalues.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    // orthonormal rows
    for (i <- 0 until 4; j <- i until 4) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"<c$i,c$j> = $dot")
    }
    // pc1 aligns with the planted dominant direction
    val dom = Array.tabulate(dim)(i => math.sin(i + 1.0))
    val nrm = math.sqrt(dom.map(x => x * x).sum)
    val cos = m.components(0).zip(dom.map(_ / nrm))
      .map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"pc1 alignment $cos")
    // sign convention: the largest-|coefficient| entry is positive
    m.components.foreach { c =>
      assert(c(c.indices.maxBy(i => math.abs(c(i)))) > 0)
    }
  }

  test("project matches the straight-line centered dot product; variance ≈ eigenvalue") {
    import spark.implicits._
    val dim = 16
    val data = synthetic(dim, 200)
    val df = data.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim, 2)
    val got = Pca.project(df, "embedding", m)
      .select("vec_id", "pc1", "pc2").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val byId = data.toMap
    def straight(v: Array[Float], j: Int): Double =
      v.map(_.toDouble).zip(m.mean).map { case (x, mu) => x - mu }
        .zip(m.components(j)).map { case (c, w) => c * w }.sum
    // project rounds to 6dp, so the straight-line value must sit
    // within half an ulp of the rounded output
    got.foreach { case (id, (p1, p2)) =>
      assert(math.abs(p1 - straight(byId(id), 0)) < 6e-7)
      assert(math.abs(p2 - straight(byId(id), 1)) < 6e-7)
    }
    // sample variance of pc1 ≈ its eigenvalue (exact up to rounding:
    // the eigenvalue IS the projected sample variance)
    val p1s = got.values.map(_._1).toArray
    val mean1 = p1s.sum / p1s.length
    val var1 = p1s.map(x => (x - mean1) * (x - mean1)).sum / (p1s.length - 1)
    assert(math.abs(var1 - m.eigenvalues(0)) / m.eigenvalues(0) < 1e-3)
  }

  test("fit skips null and ragged vectors; projection is partitioning-invariant") {
    import spark.implicits._
    val dim = 8
    val good = synthetic(dim, 60)
    val bad = Seq((900L, null.asInstanceOf[Array[Float]]),
      (901L, Array(1.0f, 2.0f)))
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim, 2)
    assert(m.n == 60)
    val a = Pca.fit(df.repartition(17), "embedding", dim, 2)
    // same data, different partitioning → same model up to float-sum
    // reordering; components agree far below the 6dp output rounding
    m.components.zip(a.components).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, v) => assert(math.abs(u - v) < 1e-6) }
    }
  }

  // ------------------------------------------------------ skyline --

  test("skyline2D ≡ naive dominance filter on random point sets (with ties)") {
    import spark.implicits._
    val pointGen = for {
      p <- Gen.chooseNum(1, 8).map(_ * 1.0)
      s <- Gen.chooseNum(1L, 8L)
    } yield (p, s)
    forAll(Gen.listOfN(60, pointGen), n = 6) { pts =>
      val df = pts.zipWithIndex
        .map { case ((p, s), i) => (i.toLong, p, s) }
        .toDF("id", "price", "size")
      val got = Skyline.skyline2D(df, "price", "size")
        .select("price", "size").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSeq
      val want = Skyline.naive2D(pts)
      assert(got.sorted == want.sorted)
    }
  }

  test("skyline keeps all duplicate-coordinate frontier points and drops null keys") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.0), Some(10L)), // frontier
      (2L, Some(1.0), Some(10L)), // duplicate frontier point — kept
      (3L, Some(2.0), Some(10L)), // dominated (same size, pricier)
      (4L, Some(2.0), Some(12L)), // frontier
      (5L, None, Some(99L)),      // null key — excluded
      (6L, Some(0.5), None)       // null key — excluded
    ).toDF("id", "price", "size")
    val got = Skyline.skyline2D(
        df.select(col("id"),
          col("price").cast("double").as("price"), col("size")),
        "price", "size")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("skyline plan: no cartesian/broadcast-nested-loop join") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 37) * 1.0, (i % 11).toLong))
      .toDF("id", "price", "size")
    val plan = Skyline.skyline2D(df, "price", "size")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  // ------------------------------------- interval union (s18) --

  test("intervalUnion: overlap merge, duplicates, per-key independence") {
    import spark.implicits._
    // key 1: [0,300s) ∪ [100s,400s) merge; [1000s,1300s) separate
    // key 2: two identical events collapse into one island
    val df = Seq((1L, 0L), (1L, 100000000L), (1L, 1000000000L),
      (2L, 50L), (2L, 50L)).toDF("user_id", "st")
    val got = EventQueries.intervalUnion(df, "user_id", "st", 300000000L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 700000000L), (2L, 1L, 300000000L)))
  }

  test("intervalUnion ≡ straight-line merge on random inputs; partitioning-invariant") {
    import spark.implicits._
    val gen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(1L, 3L)
      st <- Gen.chooseNum(0L, 2000L)
    } yield (k, st))
    def straight(pts: Seq[(Long, Long)], dur: Long): Map[Long, (Long, Long)] =
      pts.groupBy(_._1).map { case (k, es) =>
        val iv = es.map(_._2).sorted.map(s => (s, s + dur))
        val merged = iv.foldLeft(List.empty[(Long, Long)]) {
          case (acc, (s, e)) => acc match {
            case (ps, pe) :: t if s <= pe => (ps, math.max(pe, e)) :: t
            case _ => (s, e) :: acc
          }
        }
        k -> (merged.length.toLong, merged.map(i => i._2 - i._1).sum)
      }
    forAll(gen, n = 6) { pts =>
      val want = straight(pts, 500L)
      val got = EventQueries.intervalUnion(
          pts.toDF("user_id", "st").repartition(7), "user_id", "st", 500L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got == want)
    }
  }

  // ------------------------------------- vocab coverage (t32) --

  test("vocabCoverage: top-k vocab by (count desc, token) and per-doc fraction") {
    import spark.implicits._
    // counts: a=2 b=1 c=1 d=1 → top-2 = {a, b} (count then token order)
    val docs = Seq((1L, "a a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 3L, 1.0), (2L, 2L, 0.0)))
    // full-size vocab → every doc fully covered
    val full = TextAnalysis.vocabCoverage(docs, "doc_id", "text", 10)
      .collect().map(_.getDouble(2))
    assert(full.forall(_ == 1.0))
  }

  // ----------------------------------------------- edge cases --

  test("degenerate inputs: constant corpus PCA, 1-row skyline, empty interval union") {
    import spark.implicits._
    // constant vectors → zero covariance; fit succeeds with zero
    // eigenvalues and an orthonormal (identity-like) basis
    val const = (0 until 10).map(i => (i.toLong, Array.fill(4)(2.5f)))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(const, "embedding", 4, 2)
    assert(m.eigenvalues.forall(v => math.abs(v) < 1e-9))
    m.components.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
    }
    // every projection of a constant corpus is 0
    val pcs = Pca.project(const, "embedding", m)
      .select("pc1", "pc2").collect()
    pcs.foreach(r => assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0))
    // a single point is trivially the whole frontier
    val one = Seq((1L, 5.0, 3L)).toDF("id", "price", "size")
    assert(Skyline.skyline2D(one, "price", "size").count() == 1)
    // empty interval union → empty result, no degenerate-window crash
    val empty = Seq.empty[(Long, Long)].toDF("user_id", "st")
    assert(EventQueries.intervalUnion(empty, "user_id", "st", 100L)
      .count() == 0)
  }

  // --------------------------------------- count-min sketch (t33) --

  test("count-min: est ≥ exact, over-estimates rare and bounded, partitioning-invariant") {
    import spark.implicits._
    import graft.functions.CountMin
    val (depth, width, seed) = (4, 256, 42L)
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(2000)(s"w${rnd.nextInt(150)}")
    val df = items.toDF("tok")
    def build(d: org.apache.spark.sql.DataFrame): Array[Long] =
      d.agg(CountMin.sketch(depth, width, seed)(col("tok")))
        .head().getSeq[Long](0).toArray
    val grid = build(df)
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val eps = math.E / width
    // the hard guarantee: counters only add, so never an underestimate
    exact.foreach { case (k, c) =>
      assert(CountMin.estimate(grid, depth, width, seed)(k) >= c, k)
    }
    // the probabilistic bound: over-estimate ≤ ε·N w.p. 1−e^−depth per
    // key — assert violations are rare over the whole key set
    val viol = exact.count { case (k, c) =>
      CountMin.estimate(grid, depth, width, seed)(k) - c > eps * items.size
    }
    assert(viol <= math.max(1, exact.size / 20), s"$viol/${exact.size} violations")
    // exact integer merges → identical grid under any partitioning
    assert(build(df.repartition(13)).sameElements(grid))
  }
}
