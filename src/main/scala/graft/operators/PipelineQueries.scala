package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.rag.Rag

/** End-to-end RAG pipeline queries (rows-only driver checks; the
  * embedder is engine-native so no SQL oracle exists — covered by
  * ScalaTest goldens instead, SURVEY.md §2.8 Class B). */
object PipelineQueries {
  val Dim = 64
  val MaxTokens = 32
  val Query = "merge sort join the fast table scan"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1–R7 + C1/C2 + E2 end-to-end: chunk + embed the documents table
    // at query time, then exact cosine top-k for a fixed query.
    "r1_rag_retrieval" -> ((s, dir) => {
      val chunks = Rag.buildChunks(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        modelId = 1L, maxTokens = MaxTokens, dim = Dim)
      Rag.searchChunks(chunks, Rag.embedQuery(Query, Dim),
          topK = 10, threshold = 0.0)
        .select("id", "source_id", "chunk_number", "similarity")
    }),

    // M1: multimodal feature extraction — binary assets → batched
    // per-partition stub decode → feature vectors. The SQL-derivable
    // columns (asset_id, media_type, n_bytes) are oracle-checked; the
    // stub feature vector is covered by MultimodalSpec determinism.
    "m1_media_features" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.syntheticAssets(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      graft.multimodal.Multimodal.extractFeatures(assets, featureDim = 16)
        .select(col("asset_id"), col("media_type"), col("n_bytes"))
        .orderBy("asset_id")
    }),

    // M4: REAL image decode — each document id becomes an actual PNG
    // (encoded by javax.imageio with dims derived from the id), then
    // decodeImages reads it back with the same JDK codec family. The
    // oracle recomputes the expected dims as pure SQL over doc_id, so
    // the hash check pins that the real decoder ran and recovered the
    // true width/height (decoded = TRUE for every row); the histogram
    // feature is covered by MultimodalSpec.
    "m4_image_decode" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.syntheticPngAssets(
        Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.decodeImages(assets, featureDim = 16)
        .select(col("asset_id"), col("width"), col("height"), col("decoded"))
        .orderBy("asset_id")
    }),

    // M2: video frame sampling — the explode shape of a frame
    // extractor over binary assets (frame count/offsets are
    // SQL-derivable from the byte length, so fully oracle-checked).
    "m2_frame_sampling" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.syntheticAssets(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      graft.multimodal.Multimodal.sampleFrames(assets, everyNth = 10)
        .orderBy("asset_id", "frame_number")
    }),

    // R3: hybrid retrieval — BM25 over chunk text fused with the exact
    // cosine ranking by reciprocal rank (rows-only: the vector leg
    // embeds engine-natively; leg agreement and determinism are
    // asserted in CatalogRagSpec). Both legs read the same chunk+embed
    // projection, so it is shared through the session cache — one
    // embed pass, not one per leg (the d3 branch-recompute lesson; on
    // a persisted store the legs share the parquet scan instead and
    // no cache is needed).
    "r3_hybrid_retrieval" -> ((s, dir) => {
      val chunks = graft.Caches.shared(Rag.buildChunks(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        modelId = 1L, maxTokens = MaxTokens, dim = Dim))
      Rag.searchChunksHybrid(chunks, Query, topK = 10, dim = Dim)
    }),

    // M3: audio windowing — fixed-size non-overlapping segments over
    // audio assets with the last partial window's true length carried
    // (deterministic padding downstream). Same explode shape as m2;
    // all columns SQL-derivable from the byte length, so fully
    // oracle-checked.
    "m3_audio_windows" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.syntheticAssets(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      graft.multimodal.Multimodal.audioWindows(assets, windowBytes = 25)
        .orderBy("asset_id", "window_number")
    }),

    // G1–G4: the assembled contextualized prompt as a 1-row result
    // (deterministic end-to-end: chunking, embedding, retrieval and
    // template are all pure).
    "r2_rag_prompt" -> ((s, dir) => {
      import s.implicits._
      val chunks = Rag.buildChunks(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        modelId = 1L, maxTokens = MaxTokens, dim = Dim)
      val hits = Rag.searchChunks(chunks, Rag.embedQuery(Query, Dim),
        topK = 5, threshold = 0.01)
      val prompt = Rag.contextualizedPrompt(Query, Rag.aggregateChunkText(hits))
      Seq(prompt).toDF("prompt")
    }),
  )

  /** m1's non-feature columns are plain SQL over `documents`: the
    * media_type mapping is doc_id % 3 → image/audio/video and n_bytes
    * is the utf-8 byte length the binary cast produces. */
  val oracleSql: Map[String, String] = Map(
    "m3_audio_windows" ->
      """WITH v AS (SELECT doc_id AS asset_id,
        |   octet_length(encode(text)) AS n FROM documents
        |  WHERE doc_id % 3 = 1),
        | w AS (SELECT asset_id, CAST(i AS INT) AS window_number,
        |   CAST(i * 25 AS INT) AS start_byte,
        |   CAST(LEAST(25, n - i * 25) AS INT) AS window_len
        |  FROM v, UNNEST(range(0,
        |    GREATEST(CAST(CEIL(CAST(n AS DOUBLE) / 25) AS BIGINT) - 1, 0) + 1))
        |    AS u(i))
        | SELECT asset_id, window_number, start_byte, window_len FROM w
        | WHERE window_len > 0
        | ORDER BY asset_id, window_number""".stripMargin.replaceAll("\n", ""),
    "m2_frame_sampling" ->
      """WITH v AS (SELECT doc_id AS asset_id,
        |   octet_length(encode(text)) AS n FROM documents
        |  WHERE doc_id % 3 = 2),
        | f AS (SELECT asset_id, CAST(i AS INT) AS frame_number,
        |   CAST(i * 10 AS INT) AS frame_offset
        |  FROM v, UNNEST(range(0, GREATEST(CAST(FLOOR(n / 10) AS BIGINT) - 1, 0) + 1))
        |    AS u(i))
        | SELECT asset_id, frame_number, frame_offset FROM f
        | ORDER BY asset_id, frame_number""".stripMargin.replaceAll("\n", ""),
    "m4_image_decode" ->
      """SELECT doc_id AS asset_id,
        | CAST(1 + doc_id % 16 AS INT) AS width,
        | CAST(1 + doc_id % 8 AS INT) AS height,
        | TRUE AS decoded
        | FROM documents ORDER BY asset_id""".stripMargin.replaceAll("\n", ""),
    "m1_media_features" ->
      """SELECT doc_id AS asset_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        | FROM documents ORDER BY asset_id""".stripMargin.replaceAll("\n", ""),
  )
}
