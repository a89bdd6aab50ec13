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

  // ---- m5 perceptual dHash ----

  private def pngBytes(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def phashRow(content: Array[Byte], mediaType: String = "image") = {
    import org.apache.spark.sql.Row
    val assets = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, content, Row(mediaType, null, null, null, null))),
      graft.multimodal.Multimodal.AssetSchema)
    graft.multimodal.Multimodal.imagePhash(assets).head()
  }

  test("dHash is invariant under uniform brightness shift") {
    // gray(x,y) with 299+587+114 = 1000 ⇒ integer luminance == gray
    // value exactly; a constant +20 shift preserves every strict
    // comparison, so the perceptual fingerprint must not move.
    def gray(g: Int) = (g << 16) | (g << 8) | g
    val base = pngBytes(32, 24)((x, y) => gray((x * 13 + y * 7) % 180 + 20))
    val brighter =
      pngBytes(32, 24)((x, y) => gray((x * 13 + y * 7) % 180 + 40))
    val a = phashRow(base)
    val b = phashRow(brighter)
    assert((3 to 6).map(a.getInt) === (3 to 6).map(b.getInt))
  }

  test("dHash: one-pixel change moves ≤2 bits; pigeonhole chunk survives") {
    def gray(g: Int) = (g << 16) | (g << 8) | g
    def img(tweak: Boolean) = pngBytes(9, 8) { (x, y) =>
      if (tweak && x == 4 && y == 3) gray(250)
      else gray((x * 29 + y * 17) % 200)
    }
    val a = phashRow(img(tweak = false))
    val b = phashRow(img(tweak = true))
    val ham = (3 to 6).map(i =>
      Integer.bitCount(a.getInt(i) ^ b.getInt(i))).sum
    assert(ham >= 1 && ham <= 2, s"hamming=$ham")
    // Hamming ≤ 3 over 4 chunks ⟹ at least one chunk identical — the
    // d4-style blocking guarantee the candidate equi-join relies on
    assert((3 to 6).exists(i => a.getInt(i) === b.getInt(i)))
  }

  test("imagePhash: non-image and undecodable assets yield null hashes") {
    val r = phashRow(Array[Byte](1, 2, 3), mediaType = "audio")
    assert((1 to 6).forall(r.isNullAt))
    val broken = phashRow(Array[Byte](1, 2, 3), mediaType = "image")
    assert((1 to 6).forall(broken.isNullAt))
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
