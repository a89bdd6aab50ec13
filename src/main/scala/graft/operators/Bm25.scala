package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval and reciprocal-rank fusion — the lexical
  * half of a hybrid search stack (the reference's retrieval is
  * vector-only, `/root/reference/src/lib/database.py:299-309`; any
  * production RAG store pairs it with keyword search and fuses the
  * two rankings).
  *
  * Scale shape: the corpus is never exploded wholesale. Tokens are
  * filtered to the query's terms INSIDE the scan projection (a HOF
  * `filter` over the token array), so the explode emits only
  * query-term occurrences — O(matches), not O(tokens). Per-(doc,term)
  * term frequencies are one keyed shuffle of that filtered stream;
  * document frequencies and corpus stats are tiny aggregates that
  * broadcast back. The final top-k is a rounded-score
  * TakeOrderedAndProject — k rows leave each partition.
  *
  * Scoring is textbook Robertson/Sparck-Jones BM25 (public formula):
  * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
  * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
  * Scores are rounded before the sort so ranking is reproducible
  * across engines (the oracle sorts the same rounded value).
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Per-document BM25 scores for `terms` over `docs(textCol)`;
    * documents matching no term are absent. Output: (idCol, score). */
  def score(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val termArr = array(terms.distinct.map(lit): _*)
    // Term IDENTITY, so tokens come from the script-aware
    // segmentation ([[TextAnalysis.segTokens]], round 12): on
    // unspaced Han/Kana/Hangul a whitespace split makes each
    // sentence ONE term and the lexical leg retrieves nothing —
    // per-script segmentation gives CJK queries real postings. dl is
    // measured in the same unit, so the length normalization stays
    // coherent with the term stream.
    val toks = TextAnalysis.segTokens(col(textCol))
    // One light projection over the scan: doc length for every doc +
    // only the matching tokens. It feeds both the corpus-stats agg and
    // the tf agg; re-evaluating it twice is a cheap map stage, cheaper
    // at scale than persisting a corpus-sized intermediate.
    val base = docs.select(
      col(idCol),
      size(toks).as("dl"),
      filter(toks, t => array_contains(termArr, t)).as("hits"))
    // Corpus stats stay a lazy 1-row aggregate broadcast back in —
    // no eager driver job at plan-construction time.
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
    val tf = base
      .select(col(idCol), col("dl"), explode(col("hits")).as("tok"))
      .groupBy(col(idCol), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("part",
        idf * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum("part").as("score"))
  }

  /** Top-k by rounded BM25 score (ties broken on id) — the declared
    * keyword-search query shape. */
  def topK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame =
    score(docs, textCol, idCol, terms, k1, b)
      .select(col(idCol), round(col("score"), 4).as("score"))
      .orderBy(desc("score"), asc(idCol))
      .limit(k)

  /** Reciprocal-rank fusion of two rankings (public formula,
    * Cormack/Clarke/Buettcher 2009): rrf(d) = Σ_r 1/(c + rank_r(d)),
    * summed over the rankings that contain d. Each input must carry
    * (idCol, rank); ranks are 1-based. The fusion is a full outer
    * join on the id — both inputs are already top-n-bounded, so this
    * is a join of two small ranked lists regardless of corpus size.
    * Output: (idCol, rrf, rank_a, rank_b) — the per-leg ranks ride
    * along for explainability (null when a leg missed the id). */
  def rrfFuse(
      a: DataFrame,
      bDf: DataFrame,
      idCol: String,
      c: Int = 60,
      k: Int = 20): DataFrame = {
    val contrib = (r: Column) =>
      when(r.isNotNull, lit(1.0) / (lit(c.toDouble) + r)).otherwise(lit(0.0))
    a.select(col(idCol), col("rank").as("rank_a"))
      .join(bDf.select(col(idCol), col("rank").as("rank_b")),
        Seq(idCol), "full_outer")
      .select(col(idCol),
        round(contrib(col("rank_a")) + contrib(col("rank_b")), 6).as("rrf"),
        col("rank_a"), col("rank_b"))
      .orderBy(desc("rrf"), asc(idCol))
      .limit(k)
  }

  /** Attach a dense 1-based rank by (orderCol desc, idCol asc),
    * bounded to the top `n`. Single-partition window is intentional:
    * callers pass an already-aggregated/bounded ranking source, never
    * the raw corpus. */
  def ranked(df: DataFrame, idCol: String, orderCol: String, n: Int): DataFrame =
    df.select(col(idCol), col(orderCol))
      .orderBy(desc(orderCol), asc(idCol))
      .limit(n)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(desc(orderCol), asc(idCol))))
      .select(col(idCol), col("rank"))
}
