package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Deterministic contextual text embedding (SURVEY.md §2.4 E2, §7.4).
  *
  * Same *algorithm* as the reference's pseudo-embedder
  * (reference `src/lib/embedding.py:69-120`): a hash-seeded gaussian
  * base vector, per-word hash-seeded gaussian perturbations weighted by
  * term frequency, a length factor and a vocabulary-diversity factor,
  * and a final L2 normalization — with a documented JVM PRNG
  * (sha256/md5 → long seed → java.util.Random gaussians) instead of
  * numpy MT19937. This Scala spec is canonical; correctness bar is
  * self-consistency (determinism, unit norm, sensitivity), not
  * bit-equality with numpy (SURVEY.md §7.4 decision 1).
  *
  * Pure function of (text, dim): safe to evaluate on any executor, any
  * partitioning, any retry — a hard requirement for 100 TB runs where
  * task retries and speculative execution must not change results.
  */
object Embedding {
  val DefaultDim = 1536
  val DefaultModel = "graft/deterministic-hash-embedder-v1"

  private val WordPattern = Pattern.compile("\\b\\w+\\b")

  private def seedFrom(algo: String, s: String): Long = {
    val d = MessageDigest.getInstance(algo)
      .digest(s.toLowerCase.getBytes(StandardCharsets.UTF_8))
    // first 8 bytes, big-endian → long
    var seed = 0L
    var i = 0
    while (i < 8) { seed = (seed << 8) | (d(i) & 0xffL); i += 1 }
    seed
  }

  /** Word tokenization mirroring the reference's `\b\w+\b` regex
    * (reference `src/lib/embedding.py:77`), lowercased. */
  def words(text: String): Vector[String] = {
    val m = WordPattern.matcher(text.toLowerCase)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** Weight of the whole-text random base vector relative to the
    * word-level signal. The reference inverts this ratio (base 1.0,
    * words 0.1, `src/lib/embedding.py:92-99`), which makes similarity
    * mostly hash noise; as the canonical spec (SURVEY.md §7.4) we let
    * shared vocabulary dominate so cosine ranks topical overlap. */
  val BaseWeight = 0.2

  /** Per-JVM memo of word perturbation vectors: the same word's
    * gaussian vector is re-derived for every document containing it —
    * with a Zipfian vocabulary that's the dominant embedding cost.
    * The cache is pure memoization (values are a pure function of
    * (word, dim)), so results are identical with or without it, under
    * any executor placement or retry. Bounded: cleared wholesale when
    * it exceeds `MaxCachedWords` entries (vocabularies are Zipf — the
    * hot head re-fills immediately). */
  private val MaxCachedWords = 65536
  private val wordVecCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Array[Double]]()

  private def wordVector(w: String, dim: Int): Array[Double] = {
    if (wordVecCache.size > MaxCachedWords) wordVecCache.clear()
    wordVecCache.computeIfAbsent((w, dim), { case (word, d) =>
      val r = new java.util.Random(seedFrom("MD5", word))
      Array.fill(d)(r.nextGaussian())
    })
  }

  /** Deterministic embedding: text → L2-normalized Array[Float] of `dim`. */
  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Double](dim)
    // 1. base vector seeded by sha256 of the whole text
    //    (reference src/lib/embedding.py:80-85)
    val base = new java.util.Random(seedFrom("SHA-256", text))
    var i = 0
    while (i < dim) { v(i) = BaseWeight * base.nextGaussian(); i += 1 }

    // 2. per-word md5-seeded gaussian perturbation weighted by term
    //    frequency (reference src/lib/embedding.py:88-99)
    val ws = words(text)
    val total = ws.size
    if (total > 0) {
      val tf = ws.groupMapReduce(identity)(_ => 1)(_ + _)
      tf.toSeq.sortBy(_._1).foreach { case (w, n) =>
        val weight = n.toDouble / total
        val wv = wordVector(w, dim)
        var j = 0
        while (j < dim) { v(j) += weight * wv(j); j += 1 }
      }
      // 3. length + vocabulary-diversity factors
      //    (reference src/lib/embedding.py:101-113)
      val lengthFactor = math.min(text.length / 100.0, 1.0)
      val diversity = tf.size.toDouble / total
      val scale = 0.5 + 0.5 * lengthFactor * diversity
      i = 0
      while (i < dim) { v(i) *= scale; i += 1 }
    }

    // 4. L2 normalization (reference src/lib/embedding.py:115-118)
    var norm = 0.0
    i = 0
    while (i < dim) { norm += v(i) * v(i); i += 1 }
    norm = math.sqrt(norm)
    val out = new Array[Float](dim)
    val inv = if (norm == 0.0) 1.0 else 1.0 / norm
    i = 0
    while (i < dim) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }

  /** Column form: embed(textCol) with a fixed dimension. */
  def embed_text(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => if (text == null) null else embed(text, dim))

  def embedColumn(c: Column, dim: Int = DefaultDim): Column = embed_text(dim)(c)

  def register(spark: SparkSession, dim: Int = DefaultDim): Unit =
    spark.udf.register("embed_text", embed_text(dim))
}
