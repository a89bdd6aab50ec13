package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Cdc, Dedup, TextAnalysis}

/** Streaming face of the winnowing dedup family (round-11 item — the
  * d14-Bloom/ModelStreams precedent applied to d17/d18): the per-doc
  * winnowing fingerprints fold as VERSIONED STREAMING STATE on an
  * append document stream, so passage-level dedup over a continuously
  * ingested corpus never re-fingerprints history — each batch pays
  * O(batch) winnowing map work plus one keyed merge into the state.
  *
  * Two state shapes, matching the two batch outputs:
  *
  *  - [[streamingWinnowRollup]] — d17's aggregate per fingerprint
  *    ((fp) → n_docs, first_doc): count is an additive monoid and
  *    first_doc a min monoid over APPEND-ONLY docs (each document
  *    contributes its within-doc-distinct fingerprints exactly once),
  *    so a custom sum+min merge rides [[Cdc.streamingRollup]]'s
  *    exactly-once protocol unchanged — state is one row per distinct
  *    fingerprint, vocabulary-sized.
  *  - [[streamingWinnowFps]] — the full (id, fp) POSTING LIST d18's
  *    pair decisions need (containment denominators + the fp-keyed
  *    self-join want per-doc rows, not the rollup). This is the
  *    materialized ingest-time index (the buildMinHashIndex shape) as
  *    streaming state; pair queries run
  *    [[Dedup.sharedPassagePairsFrom]] over the committed version.
  *
  * Stream ≡ batch is spec-pinned (Round11OpsSpec): folding the corpus
  * through in N append batches yields state whose derived d17/d18
  * tables are row-identical to the one-shot batch queries. */
object DedupStreams {

  /** One batch's d17-state delta: within-doc-distinct fingerprints
    * aggregated per fp. */
  def winnowRollupBatch(k: Int, w: Int)(batch: DataFrame): DataFrame =
    Dedup.winnowFingerprints(batch, "doc_id", "text", k, w)
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))

  /** The sum+min merge monoid shared by the d17 and d20 states
    * (mergeRollup's default is additive-only; the min column must
    * take the minimum across batches, not the sum) — parameterized
    * on column names so a future protocol change lands once. */
  private def mergeSumMinOn(countCol: String, minCol: String)(
      state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(countCol).as(countCol), min(minCol).as(minCol))

  /** sum(n_docs) + min(first_doc) keyed merge — the d17 monoid. */
  private[streaming] def mergeSumMin(
      state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame =
    mergeSumMinOn("n_docs", "first_doc")(state, delta, keyCols)

  /** Fold an append document stream (doc_id, text, …) into d17's
    * per-fingerprint rollup state. */
  def streamingWinnowRollup(
      docs: DataFrame, statePath: String, checkpoint: String,
      k: Int = 8, w: Int = 4): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("fp"),
      winnowRollupBatch(k, w), checkpoint, mergeSumMin)

  /** d17's repeated-fingerprint table from the CURRENT committed
    * state (None until a first batch commits) — identical contract to
    * the batch query: (fp, n_docs, first_doc), n_docs ≥ 2. */
  def winnowRepeatsFromState(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(
      _.filter(col("n_docs") >= 2).select("fp", "n_docs", "first_doc"))

  /** One batch's posting-list delta: (id, fp) rows with a count-1
    * payload (the additive default merges replayed keys exactly;
    * within-doc distinctness makes c always 1 for an append corpus). */
  def winnowFpBatch(k: Int, w: Int)(batch: DataFrame): DataFrame =
    Dedup.winnowFingerprints(batch, "doc_id", "text", k, w)
      .select(col("doc_id").cast("long").as("id"), col("fp"),
        lit(1L).as("c"))

  /** Fold an append document stream into the (id, fp) posting-list
    * state d18's pair decisions query. */
  def streamingWinnowFps(
      docs: DataFrame, statePath: String, checkpoint: String,
      k: Int = 8, w: Int = 4): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("id", "fp"),
      winnowFpBatch(k, w), checkpoint)

  /** d18's shared-passage pair decisions from the CURRENT committed
    * posting-list state (None until a first batch commits) — identical
    * contract to the batch query. */
  def sharedPassagesFromState(
      spark: SparkSession, statePath: String,
      minShared: Long = 2L, maxDocsPerFp: Long = 64L): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      Dedup.sharedPassagePairsFrom(st.select("id", "fp"),
        minShared, maxDocsPerFp))

  // -------------------------------------------------------------
  // Exact-substring dup-gram state (d20's duplicated-text table)
  // -------------------------------------------------------------

  /** One batch's d20-state delta: per stride-1 k-gram hash, the
    * batch's distinct-doc count and min doc id. Within-batch
    * (g, id)-distinct plus append-only docs (a doc never recurs
    * across batches) make the summed deltas equal the global
    * distinct-doc count — the same argument as
    * [[winnowRollupBatch]]'s. */
  def substringDupBatch(k: Int)(batch: DataFrame): DataFrame =
    Dedup.gramStarts(batch.select(
        col("doc_id").cast("long").as("id"),
        TextAnalysis.segTokens(col("text")).as("tk")), k)
      .select("g", "id").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"), min("id").as("keep_id"))

  /** sum(nd) + min(keep_id) keyed merge — the d20 monoid. */
  private[streaming] def mergeSumMinDup(
      state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame =
    mergeSumMinOn("nd", "keep_id")(state, delta, keyCols)

  /** Fold an append document stream into d20's per-gram dup state. */
  def streamingSubstringDups(
      docs: DataFrame, statePath: String, checkpoint: String,
      k: Int = 8): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("g"),
      substringDupBatch(k), checkpoint, mergeSumMinDup)

  /** d20's removal output for `df` scored against the CURRENT
    * committed dup state (None until a first batch commits) — the
    * ingest-time form: the duplicated-gram table comes from the fold
    * of everything ingested so far, and only the documents being
    * cleaned pay gram + rebuild work. Identical contract to the batch
    * query when the state has folded the same corpus
    * (spec-pinned). */
  def substringRemovalFromState(
      spark: SparkSession, statePath: String, df: DataFrame,
      k: Int = 8): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map { st =>
      val toks = Dedup.tokArrays(df, "doc_id", "text")
      Dedup.removeCoveredAgainst(toks, Dedup.gramStarts(toks, k),
        st.filter(col("nd") >= 2).select("g", "keep_id"), k)
    }

  // -------------------------------------------------------------
  // Boilerplate paragraph doc-frequency state (d19)
  // -------------------------------------------------------------

  /** One batch's d19-state delta: per paragraph hash, the batch's
    * distinct-doc count. Within-batch (h, doc)-distinct plus
    * append-only docs make the summed deltas equal the global
    * doc frequency — the additive default merge suffices. */
  def boilerplateBatch(batch: DataFrame): DataFrame =
    // paraView, NOT paraTable: the cached wrapper is right for the
    // batch query (which scans the view twice), but inside
    // foreachBatch nothing releases the cache, so each micro-batch
    // would pin one persisted table for the stream's lifetime; the
    // shared projection keeps the paragraph DEFINITION single-sourced
    Dedup.paraView(batch, "doc_id", "text")
      .select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("nd"))

  /** Fold an append document stream into d19's per-paragraph-hash
    * doc-frequency state. */
  def streamingBoilerplateCounts(
      docs: DataFrame, statePath: String, checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(docs, statePath, Seq("h"),
      boilerplateBatch, checkpoint)

  /** d19's removal output for `df` scored against the CURRENT
    * committed paragraph-frequency state (None until a first batch
    * commits) — the ingest-time form: the boilerplate set comes from
    * the fold of everything ingested so far, and only the documents
    * being cleaned pay paragraph + rebuild work. */
  def boilerplateRemovalFromState(
      spark: SparkSession, statePath: String, df: DataFrame,
      maxDocs: Long = 32L): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map { st =>
      Dedup.removeBoilerplateAgainst(
        Dedup.paraTable(df, "doc_id", "text"),
        st.filter(col("nd") > maxDocs).select("h"))
    }

  // -------------------------------------------------------------
  // Benchmark gram-set state (d21's contamination screen)
  // -------------------------------------------------------------

  /** One batch's d21-state delta: the batch's distinct 13-gram hashes
    * with a count payload (benchmark suites GROW over time — each new
    * eval slice folds its grams in; replayed grams merge
    * additively). */
  def benchGramBatch(k: Int)(batch: DataFrame): DataFrame =
    // decontamTokens, NOT raw segTokens: the state must hold the same
    // NORMALIZED (NFKC-casefold + punctuation-stripped) grams the
    // batch screen matches against (round 12)
    Dedup.gramStarts(batch.select(
        col("doc_id").cast("long").as("id"),
        Dedup.decontamTokens(col("text")).as("tk")), k)
      .select("g").distinct()
      .select(col("g"), lit(1L).as("c"))

  /** Fold an append BENCHMARK stream into the gram-set state train
    * batches are screened against. */
  def streamingBenchGrams(
      bench: DataFrame, statePath: String, checkpoint: String,
      k: Int = 13): StreamingQuery =
    Cdc.streamingRollup(bench, statePath, Seq("g"),
      benchGramBatch(k), checkpoint)

  /** d21's contamination report for `train` against the CURRENT
    * committed benchmark gram state (None until a first batch
    * commits) — the ingest-time screen: only the train documents
    * being checked pay gram work; the committed gram set broadcasts
    * exactly like the batch op's. */
  def contaminationFromState(
      spark: SparkSession, statePath: String, train: DataFrame,
      k: Int = 13): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      Dedup.contaminationAgainst(train, st.select("g"),
        "doc_id", "text", k))

  // -------------------------------------------------------------
  // Image pHash near-dup state (m8)
  // -------------------------------------------------------------

  /** One asset batch's hash delta: m8's per-image dHash chunks plus
    * the decoded dimensions (non-images drop out on the null filter).
    * Each batch pays only its own decode work — the expensive half of
    * image dedup — so hashing happens ONCE per image at ingest, not
    * per dedup run. width/height ride in the state (round 12) so the
    * m9 collapse decision can rank cluster representatives by pixel
    * area without ever re-decoding. */
  def phashBatch(batch: DataFrame): DataFrame =
    graft.multimodal.Multimodal.imagePhash(batch)
      .filter(col("h0").isNotNull)
      .select(col("asset_id"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("width"), col("height"))

  /** Keyed ATOMIC min-merge: the winning ROW is the h3-major-minimum
    * of the four 16-bit chunks, and every payload column (the chunks
    * plus whatever rides along — m9's width/height) comes from that
    * one row WHOLESALE, so the merged row is always ONE real
    * observation. An idempotent insert for the append case (replayed
    * identical rows fold to themselves), and if an upstream ever
    * re-emits an asset id with DIFFERENT content the state keeps the
    * h3-major-smallest of the real hashes — a per-column independent
    * min would instead fuse a franken-row no image ever had. The
    * order is a struct min over (h3, h2, h1, h0, payload…): chunks
    * are 16-bit values in non-negative ints, so the signed struct
    * order IS the unsigned h3-major order — no sign-wrap case exists
    * (the round-11 packed-long form broke exactly there: h3 ≥ 0x8000
    * packed negative and beat smaller hashes; advisor, round 12).
    *
    * PAYLOAD-SCHEMA MIGRATION (advisor, round 13): a committed state
    * written by an older batch function can lack payload columns a
    * newer one emits (round 11 pHash states carried h0..h3 only;
    * round 12 added width/height) — a plain unionByName would fail
    * analysis and silently brick every pre-upgrade stream state. Both
    * sides are therefore aligned to the UNION of their schemas first,
    * missing columns null-filled (delta's types win for new columns).
    * On an EQUAL chunk prefix, a row with fewer null payload fields
    * wins (a null-count discriminator sits between the chunks and the
    * payload in the struct order — round-14 advisor fix): a
    * pre-upgrade state row's null-filled payload is REPLACED the
    * first time the asset is re-emitted post-upgrade — the null
    * really is re-derivable by re-emitting the asset — while a bare
    * null sorting first would have pinned it forever (and made
    * imageDedupFromState's area-ranked rep choice diverge from the
    * batch contract for migrated assets). Assets observed only
    * post-upgrade are unaffected: their equal-chunk re-emissions
    * carry equal payload, so the discriminator ties at 0. */
  private[graft] def mergeMinChunks(
      state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val target = delta.schema.fields ++
      state.schema.fields.filterNot(f => delta.columns.contains(f.name))
    def aligned(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(target.map(f =>
        if (have(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    }
    val u = aligned(state).unionByName(aligned(delta))
    val payload = u.columns.toSeq.filterNot(keyCols.contains)
    val hs = Seq("h3", "h2", "h1", "h0")
    require(hs.forall(payload.contains), s"chunk columns missing: $payload")
    val rest = payload.filterNot(hs.contains)
    val nullDisc = rest.map(c => col(c).isNull.cast("int"))
      .reduceOption(_ + _).getOrElse(lit(0)).as("__nulls")
    val ordered = hs.map(col) ++ (nullDisc +: rest.map(col))
    u.groupBy(keyCols.map(col): _*)
      .agg(min(struct(ordered: _*)).as("__m"))
      .select(keyCols.map(col) ++ payload.map(c =>
        col(s"__m.$c").as(c)): _*)
  }

  /** Fold an append image-asset stream (asset_id, content, meta) into
    * the per-asset pHash state m8's pair query reads. */
  def streamingPhashes(
      assets: DataFrame, statePath: String,
      checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(assets, statePath, Seq("asset_id"),
      phashBatch, checkpoint, mergeMinChunks)

  /** m8's near-dup pairs from the CURRENT committed hash state (None
    * until a first batch commits) — identical contract to the batch
    * query when the state has folded the same assets (spec-pinned):
    * the blocking + verify pass runs over hashes alone; no image is
    * ever re-decoded. */
  def phashPairsFromState(
      spark: SparkSession, statePath: String,
      maxDist: Int = 3): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      graft.multimodal.Multimodal.phashNearDupPairs(st, maxDist))

  /** m9's collapse DECISION from the committed pHash state (round 12):
    * the state carries (h0..h3, width, height) per asset — decode
    * happened once at ingest — so the cluster + keep-policy pass runs
    * on hashes alone and matches the batch operator exactly when the
    * state has folded the same assets (spec-pinned). */
  def imageDedupFromState(
      spark: SparkSession, statePath: String,
      maxDist: Int = 3): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      graft.multimodal.Multimodal.imageDedupFromHashes(st, maxDist))

  // -------------------------------------------------------------
  // Resize-normalized fingerprint state (m13)
  // -------------------------------------------------------------

  /** One asset batch's m13 delta: the fused resize→dHash fingerprint
    * over the NORMALIZED raster plus the SOURCE dims (the keep
    * policy's area) — decode + resize + hash happen once at ingest.
    * Same (h0..h3, payload) shape as the pHash state, so the atomic
    * h3-major struct-min merge applies unchanged. */
  def resizeFpBatch(maxDim: Int)(batch: DataFrame): DataFrame =
    graft.multimodal.Multimodal.resizeFingerprint(batch, maxDim)
      .select(col("asset_id").cast("long").as("asset_id"),
        col("h0"), col("h1"), col("h2"), col("h3"),
        col("width"), col("height"))

  /** Fold an append image-asset stream into the per-asset NORMALIZED
    * fingerprint state m13's collapse reads. */
  def streamingResizeFps(
      assets: DataFrame, statePath: String, checkpoint: String,
      maxDim: Int = 8): StreamingQuery =
    Cdc.streamingRollup(assets, statePath, Seq("asset_id"),
      resizeFpBatch(maxDim), checkpoint, mergeMinChunks)

  /** m13's scale-invariant dedup DECISION from the committed
    * normalized-fingerprint state — identical to the batch operator
    * when the state has folded the same assets (spec-pinned): the
    * state carries the normalized chunks + source dims, so the
    * collapse (and its keep-the-highest-resolution policy) runs with
    * zero re-decode. Reuses the pHash-state collapse verbatim — the
    * score IS source pixel area there too. */
  def scaleDedupFromState(
      spark: SparkSession, statePath: String,
      maxDist: Int = 3): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      graft.multimodal.Multimodal.imageDedupFromHashes(st, maxDist))

  // -------------------------------------------------------------
  // Video frame-hash state (m11)
  // -------------------------------------------------------------

  /** One asset batch's m11 delta: per-SAMPLED-FRAME dHash chunks —
    * the zip walk + selective decode happens once at ingest, so the
    * collapse never re-opens a container. Keyed by
    * (asset_id, frame_number); a re-emitted frame folds under the
    * same atomic h3-major struct-min as the image/audio states. */
  def videoFrameHashBatch(everyNth: Int)(batch: DataFrame): DataFrame =
    graft.multimodal.Multimodal.zipFrameHashes(batch, everyNth)
      .select(col("asset_id").cast("long").as("asset_id"),
        col("frame_number"), col("h0"), col("h1"), col("h2"), col("h3"))

  /** Fold an append video-asset stream into the per-frame hash state
    * m11's collapse reads. */
  def streamingVideoFrameHashes(
      assets: DataFrame, statePath: String, checkpoint: String,
      everyNth: Int = 2): StreamingQuery =
    Cdc.streamingRollup(assets, statePath, Seq("asset_id", "frame_number"),
      videoFrameHashBatch(everyNth), checkpoint, mergeMinChunks)

  /** m11's dedup DECISION from the committed frame-hash state —
    * identical to the batch operator when the state has folded the
    * same assets (spec-pinned): the frameset signatures, rep pair
    * graph and keep policy all derive from hashes alone. */
  def videoDedupFromState(
      spark: SparkSession, statePath: String, minShared: Int = 2,
      tau100: Int = 50, maxDf: Int = 64): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      graft.multimodal.Multimodal.videoDedupFromFrameHashes(
        st, minShared, tau100, maxDf))

  // -------------------------------------------------------------
  // Audio fingerprint state (m10)
  // -------------------------------------------------------------

  /** One asset batch's audio-fingerprint delta (m10): per-asset
    * delta-sign chunks plus the duration score the keep policy ranks
    * by. Each batch pays its own decode + fingerprint work once at
    * ingest — the audio analogue of [[phashBatch]], folding under the
    * same atomic [[mergeMinChunks]] (score rides with the winning
    * row). */
  def audioFpBatch(batch: DataFrame): DataFrame =
    graft.multimodal.Multimodal.audioFingerprint(batch, windowSamples = 1)
      .join(batch.select(col("asset_id").cast("long").as("asset_id"),
        col("meta.duration_ms").cast("long").as("score")), "asset_id")
      .select("asset_id", "h0", "h1", "h2", "h3", "score")

  /** Fold an append audio-asset stream into the per-asset fingerprint
    * state m10's collapse reads. */
  def streamingAudioFps(
      assets: DataFrame, statePath: String,
      checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(assets, statePath, Seq("asset_id"),
      audioFpBatch, checkpoint, mergeMinChunks)

  /** m10's dedup DECISION from the committed fingerprint state —
    * identical to the batch operator when the state has folded the
    * same assets (spec-pinned): the state already carries
    * (h0..h3, score), so no audio is re-decoded. */
  def audioDedupFromState(
      spark: SparkSession, statePath: String,
      maxDist: Int = 3): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(st =>
      graft.multimodal.Multimodal.fingerprintDedup(st, maxDist))

  // -------------------------------------------------------------
  // Frame-luma state (m17/m18) and wav-window state (m19)
  // -------------------------------------------------------------

  /** Generic atomic struct-min merge for keyed DETERMINISTIC
    * recomputations (frame luma stats, wav window stats): a re-emitted
    * row is byte-identical to the state's, so any associative,
    * idempotent pick is correct — the lexicographic struct-min keeps
    * the whole payload atomic (never mixes fields from two emissions),
    * the same discipline as [[mergeMinChunks]] without the chunk
    * schema contract. */
  private[streaming] def mergeLeastStruct(
      state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val u = state.unionByName(delta)
    val payload = u.columns.toSeq.filterNot(keyCols.contains)
    u.groupBy(keyCols.map(col): _*)
      .agg(min(struct(payload.map(col): _*)).as("__m"))
      .select(keyCols.map(col) ++ payload.map(c =>
        col(s"__m.$c").as(c)): _*)
  }

  /** One asset batch's m17 delta: per-frame integer luma statistics
    * from the REAL container walk — the zip directory stream + PNG
    * decode happens once at ingest, so the scene detector never
    * re-opens a container. Keyed by (asset_id, frame_number). */
  def frameLumaBatch(batch: DataFrame): DataFrame =
    graft.multimodal.Multimodal.sampleZipFrames(batch, everyNth = 1)
      .select(col("asset_id").cast("long").as("asset_id"),
        col("frame_number"), col("luma_sum"), col("n_px"))

  /** Fold an append video-asset stream into the per-frame luma state
    * the m17/m18 detectors read. */
  def streamingFrameLumas(
      assets: DataFrame, statePath: String,
      checkpoint: String): StreamingQuery =
    Cdc.streamingRollup(assets, statePath, Seq("asset_id", "frame_number"),
      frameLumaBatch, checkpoint, mergeLeastStruct)

  /** m17's scene-cut table from the committed frame-luma state —
    * identical to the batch operator when the state has folded the
    * same assets (spec-pinned): the lag/threshold/running-count chain
    * is ONE definition (PipelineQueries.sceneCutsFromFrames) and runs
    * over narrow integers with ZERO re-decode — decode is the
    * expensive half of m17 and ingest already paid it. */
  def sceneCutsFromState(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(
      graft.operators.PipelineQueries.sceneCutsFromFrames)

  /** m18's keyframe selection from the same committed state — the
    * keyed fold over [[sceneCutsFromState]]'s output. */
  def keyframesFromState(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    sceneCutsFromState(spark, statePath).map(scn =>
      scn.groupBy(col("asset_id"), col("scene_id"))
        .agg(min("frame_number").as("keyframe"),
          min_by(col("luma_sum"), col("frame_number")).as("keyframe_luma"),
          count(lit(1)).as("n_frames")))

  /** One asset batch's m19 delta: per-window integer sample statistics
    * from the REAL WAV decode — the codec cost lands once at ingest.
    * Keyed by (asset_id, window_number). */
  def wavWindowBatch(windowSamples: Int)(batch: DataFrame): DataFrame =
    graft.multimodal.Multimodal.decodeWavWindows(batch, windowSamples)
      .select(col("asset_id").cast("long").as("asset_id"),
        col("window_number"), col("n_samples"), col("sample_sum"),
        col("sample_min"), col("sample_max"))

  /** Fold an append audio-asset stream into the per-window state the
    * m19 segmenter reads. */
  def streamingWavWindows(
      assets: DataFrame, statePath: String, checkpoint: String,
      windowSamples: Int = 32): StreamingQuery =
    Cdc.streamingRollup(assets, statePath, Seq("asset_id", "window_number"),
      wavWindowBatch(windowSamples), checkpoint, mergeLeastStruct)

  /** m19's silence segments from the committed wav-window state —
    * identical to the batch operator when the state has folded the
    * same assets (spec-pinned): the peak test + gaps-and-islands fold
    * is ONE definition (PipelineQueries.silenceSegmentsFromWindows)
    * over narrow integers, ZERO re-decode. */
  def silenceSegmentsFromState(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    Cdc.readRollup(spark, statePath).map(
      graft.operators.PipelineQueries.silenceSegmentsFromWindows)

  /** d22's cross-modality dedup AUDIT from the committed media states
    * (round 13 — the audit rung's streaming face): image pHash, audio
    * fingerprint and video frame-hash states each yield their collapse
    * decision with ZERO re-decode (ingest paid the codec work once),
    * an optional text decision table rides along, and the rollup is
    * the SAME `dedupAuditRollup` the batch d22 folds — the report a
    * pipeline operator reads continuously as the corpus streams in.
    * None until at least one media state has committed a batch. */
  def dedupAuditFromStates(
      spark: SparkSession, phashState: String, audioState: String,
      videoState: String,
      textDecision: Option[DataFrame] = None,
      weights: Map[String, (DataFrame, String)] = Map.empty)
      : Option[DataFrame] = {
    val media = Seq(
      "image" -> imageDedupFromState(spark, phashState),
      "audio" -> audioDedupFromState(spark, audioState),
      "video" -> videoDedupFromState(spark, videoState))
      .collect { case (m, Some(df)) => m -> df }
    val all = media ++ textDecision.map("text" -> _).toSeq
    if (all.isEmpty) None
    else Some(graft.operators.PipelineQueries.dedupAuditRollup(
      all.map { case (m, dec) =>
        weights.get(m) match {
          case Some((wdf, unit)) =>
            m -> graft.operators.PipelineQueries
              .weightedDecision(dec, wdf, unit)
          // no ingest-time weight projection supplied → item-count
          // weighting (volume columns degrade to the item counts,
          // explicitly unit-tagged so a reader can tell)
          case None => m -> dec.withColumn("weight", lit(1L))
            .withColumn("vol_unit", lit("items"))
        }
      }))
  }
}
