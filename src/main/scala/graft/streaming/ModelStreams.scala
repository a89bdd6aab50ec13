package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Cdc, TextQueries}

/** Streaming faces for the trained text models (round-8 item): the NB
  * language-classifier counts (t36) and the BPE training word counts
  * (t37) fold as STREAMING STATE on an append document stream, so the
  * models refresh incrementally instead of re-scanning the corpus.
  *
  * Both models' training state is an additive count monoid —
  * (cls, tok) token counts + (cls) doc counts for NB, (word) counts
  * for BPE — so each rides [[Cdc.streamingRollup]]'s versioned-state
  * protocol unchanged (exactly-once per batch id, atomic committed
  * versions, pruned history), with the default additive merge. The
  * expensive model DERIVATION (quantized weights + pivot for NB, the
  * k-round merge loop for BPE) runs over the *state table* — which is
  * vocabulary-sized, not corpus-sized — whenever a refreshed model is
  * wanted; the corpus is only ever paid once per new batch.
  *
  * Stream ≡ batch is pinned by spec (Round8OpsSpec): folding the
  * corpus through in N append batches yields byte-identical state to
  * the one-shot batch aggregate, hence an identical derived model and
  * identical t36/t37 query output.
  */
object ModelStreams {

  // -------------------------------------------------------------
  // NB language-ID counts (t36's training state)
  // -------------------------------------------------------------

  /** One batch's NB training-state delta: token counts and doc counts
    * stacked in one keyed table (kind ∈ tok|doc; doc rows carry a null
    * token — mergeRollup keys null-safely). One state table means ONE
    * streaming sink and an atomic model: priors and evidence always
    * come from the same committed version. */
  def nbCountBatch(batch: DataFrame): DataFrame = {
    val train = batch.select(col("doc_id"), col("lang"), col("text"))
    TextQueries.nbTokCounts(train)
      .select(lit("tok").as("kind"), col("cls"), col("tok"), col("c"))
      .unionByName(TextQueries.nbDocCounts(train)
        .select(lit("doc").as("kind"), col("cls"),
          lit(null).cast("string").as("tok"), col("nd").as("c")))
  }

  /** Fold an append stream of TRAINING documents (doc_id, lang, text)
    * into the NB count state at `statePath`. The caller picks the
    * training slice (t36 trains on doc_id % 3 == 0) by filtering the
    * stream — the fold itself is slice-agnostic. */
  def streamingNbCounts(
      docs: DataFrame, statePath: String, checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("kind", "cls", "tok"),
      nbCountBatch, checkpoint)

  /** The t36 confusion matrix scored from the CURRENT streamed model
    * state — identical pipeline to the batch query, reading counts
    * from the committed state version instead of re-aggregating the
    * training corpus. None until a first batch commits. */
  def nbConfusionFromState(
      spark: SparkSession, statePath: String, d: DataFrame): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map { st =>
      TextQueries.nbConfusion(
        d.select(col("doc_id"), col("lang"),
          graft.operators.TextAnalysis.segTokens(col("text")).as("tk")),
        st.filter(col("kind") === "tok").select("cls", "tok", "c"),
        st.filter(col("kind") === "doc")
          .select(col("cls"), col("c").as("nd")))
    }

  // -------------------------------------------------------------
  // BPE word counts (t37's training state)
  // -------------------------------------------------------------

  /** Fold an append document stream into the BPE word-frequency state
    * — the vocab table the k-round merge loop trains over. */
  def streamingBpeWordCounts(
      docs: DataFrame, statePath: String, checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("w"),
      TextQueries.bpeWordCountsOf, checkpoint)

  /** Train the merge table from the CURRENT streamed word-count state
    * (t37's loop over the state instead of a fresh corpus scan).
    * None until a first batch commits. */
  def bpeModelFromState(
      spark: SparkSession, statePath: String,
      k: Int = TextQueries.BpeMergeCount)
      : Option[Vector[(String, String, Long)]] =
    Cdc.readRollup(spark, statePath).map(TextQueries.trainBpe(_, k))

  // -------------------------------------------------------------
  // Bigram-LM counts (t44's training state)
  // -------------------------------------------------------------

  /** One batch's LM training-state delta: unigram and bigram counts
    * stacked in one keyed table (kind ∈ uni|big; uni rows carry a
    * null w2 — mergeRollup keys null-safely). One state table means
    * ONE streaming sink and an atomic model: V, the a6 cells and the
    * b6 cells always derive from the same committed version. */
  def lmCountBatch(batch: DataFrame): DataFrame = {
    val t = batch.select(col("doc_id"),
      graft.operators.TextAnalysis.segTokens(col("text")).as("tk"))
    TextQueries.lmUniCounts(t)
      .select(lit("uni").as("kind"), col("w").as("w1"),
        lit(null).cast("string").as("w2"), col("c1").as("c"))
      .unionByName(TextQueries.lmBigCounts(t)
        .select(lit("big").as("kind"), col("w1"), col("w2"),
          col("c2").as("c")))
  }

  /** Fold an append stream of TRAINING documents (doc_id, text) into
    * the bigram-LM count state at `statePath`. The caller picks the
    * training slice (t44 trains on doc_id % 3 == 0) by filtering the
    * stream — the fold itself is slice-agnostic. */
  def streamingLmCounts(
      docs: DataFrame, statePath: String, checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("kind", "w1", "w2"),
      lmCountBatch, checkpoint)

  /** t44's perplexity + tercile output scored from the CURRENT
    * streamed count state — identical pipeline to the batch query,
    * reading the model counts from the committed state version
    * instead of re-aggregating the training corpus. `d` is the
    * (doc_id, tk) table to score. None until a first batch commits. */
  def lmPerplexityFromState(
      spark: SparkSession, statePath: String, d: DataFrame): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map { st =>
      TextQueries.lmPerplexity(d,
        st.filter(col("kind") === "uni")
          .select(col("w1").as("w"), col("c").as("c1")),
        st.filter(col("kind") === "big")
          .select(col("w1"), col("w2"), col("c").as("c2")))
    }

  // -------------------------------------------------------------
  // Quality-classifier counts (t48's training state)
  // -------------------------------------------------------------

  /** One batch's t48 training-state delta: each batch LABELS its own
    * docs with the shared language-agnostic Gopher rule subset
    * (labels are a pure function of the row — no cross-batch state
    * needed) and emits per-(class, token) counts plus class doc
    * counts, stacked in one keyed table (kind ∈ tok|doc; doc rows
    * carry a null token). */
  def qualityCountBatch(batch: DataFrame): DataFrame = {
    val labeled = batch.select(col("doc_id"),
        graft.operators.TextAnalysis.segTokens(col("text")).as("tk"))
      .join(TextQueries.qualityLabels(
        batch.select(col("doc_id"), col("text"))), "doc_id")
    TextQueries.qualityTokCounts(labeled)
      .select(lit("tok").as("kind"), col("keep"), col("tok"), col("c"))
      .unionByName(TextQueries.qualityDocCounts(labeled)
        .select(lit("doc").as("kind"), col("keep"),
          lit(null).cast("string").as("tok"), col("nd").as("c")))
  }

  /** Fold an append stream of TRAINING documents (doc_id, text) into
    * the quality-classifier count state. The caller picks the
    * training slice (t48 trains on doc_id % 3 == 0) by filtering the
    * stream — the fold itself is slice-agnostic. */
  def streamingQualityCounts(
      docs: DataFrame, statePath: String, checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("kind", "keep", "tok"),
      qualityCountBatch, checkpoint)

  /** t48's log-odds + decision scored from the CURRENT streamed count
    * state — identical pipeline to the batch query (state-in = model).
    * `d` is the (doc_id, tk) table to score. None until a first batch
    * commits. */
  def qualityFromState(
      spark: SparkSession, statePath: String, d: DataFrame): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map { st =>
      TextQueries.qualityLogOdds(d,
        st.filter(col("kind") === "tok").select("keep", "tok", "c"),
        st.filter(col("kind") === "doc")
          .select(col("keep"), col("c").as("nd")))
    }

  /** t49's evaluation rollup from the streamed count state (round 13
    * — the classifier-gate family's last streaming face): score `d`
    * through [[qualityFromState]] and fold the held-out confusion
    * matrix + metrics through the SAME `qualityConfusion` the batch
    * query uses. `labels` is the rule-label table (doc_id, keep);
    * None until a first training batch commits. */
  def qualityEvalFromState(
      spark: SparkSession, statePath: String, d: DataFrame,
      labels: DataFrame): Option[DataFrame] =
    qualityFromState(spark, statePath, d)
      .map(scored => TextQueries.qualityConfusion(scored, labels))
}
