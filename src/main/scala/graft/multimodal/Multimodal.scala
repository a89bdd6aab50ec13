package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The decode kernels are STUBS (deterministic, hash-derived — the
  * container has no image/audio libraries); everything around them is
  * real and load-bearing at scale: the asset schema, the binary
  * column handling, the `mapPartitions` batch shape (decode batches of
  * `batchSize` assets at a time, the shape a native/JNI or Arrow-based
  * decoder needs), and the partition sizing guidance (binary payloads
  * make rows heavy — repartition by byte budget, not row count).
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MediaMetaSchema, nullable = false)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode kernel: a real implementation hands the whole batch
    * to a native decoder (libjpeg/ffmpeg/...); this deterministic fake
    * derives a feature vector from the bytes so the distributed
    * plumbing is fully exercisable and testable. */
  private[multimodal] def decodeBatchStub(
      batch: Seq[(Long, Array[Byte], String)], featureDim: Int): Seq[Row] =
    batch.map { case (id, bytes, mediaType) =>
      val feat = new Array[Float](featureDim)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      i = 0
      var s = h
      while (i < featureDim) {
        // xorshift64 over the content hash — deterministic per asset
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        feat(i) = (s.toDouble / Long.MaxValue).toFloat
        i += 1
      }
      Row(id, mediaType, bytes.length.toLong, feat.toSeq)
    }

  /** Batched per-partition feature extraction over binary assets.
    * mapPartitions + grouped(batchSize) is the batch shape a columnar
    * decoder wants; no shuffle — a narrow map over the asset scan with
    * only (asset_id, content, media_type) columns read. */
  def extractFeatures(
      assets: DataFrame, featureDim: Int = 64, batchSize: Int = 32): DataFrame = {
    val spark = assets.sparkSession
    val rows = assets
      .select(col("asset_id"), col("content"), col("meta.media_type"))
      .rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { rs =>
          decodeBatchStub(
            rs.map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getString(2))),
            featureDim)
        }
      }
    spark.createDataFrame(rows, FeatureSchema)
  }

  /** STUB frame sampling for video assets: every `everyNth` "frame"
    * (byte-window stand-in) becomes a row — the explode shape of a
    * real frame extractor, with the ordinal carried like the chunker's
    * chunk_number. */
  def sampleFrames(assets: DataFrame, everyNth: Int = 10): DataFrame = {
    val frameCount = (length(col("content")) / everyNth).cast("int")
    assets
      .filter(col("meta.media_type") === "video")
      .select(
        col("asset_id"),
        posexplode(sequence(lit(0), greatest(frameCount - 1, lit(0))))
          .as(Seq("frame_number", "frame_offset")))
      .withColumn("frame_offset", col("frame_offset") * everyNth)
  }

  /** STUB audio windowing: fixed-size non-overlapping byte windows
    * over audio assets — the segmentation shape of a real resample/
    * feature pipeline (each window would become a spectrogram patch).
    * The last partial window is kept and its true length carried, so
    * downstream batching can pad deterministically. */
  def audioWindows(assets: DataFrame, windowBytes: Int = 25): DataFrame = {
    val n = length(col("content"))
    val nWin = ceil(n.cast("double") / windowBytes).cast("int")
    assets
      .filter(col("meta.media_type") === "audio")
      .select(
        col("asset_id"), n.as("n_bytes"),
        posexplode(sequence(lit(0), greatest(nWin - 1, lit(0)))).as(Seq("window_number", "w")))
      .select(
        col("asset_id"),
        col("window_number"),
        (col("w") * windowBytes).as("start_byte"),
        least(lit(windowBytes), col("n_bytes") - col("w") * windowBytes)
          .cast("int").as("window_len"))
      .filter(col("window_len") > 0)
  }

  /** Repartition a binary-heavy table by byte budget: binary rows are
    * orders of magnitude heavier than relational rows, so partition
    * count must follow Σ bytes, not row count — this is what keeps
    * executor memory bounded at 100 TB. */
  def repartitionByBytes(
      assets: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val totalBytes = assets
      .agg(coalesce(sum(length(col("content"))), lit(0L))).head().getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    assets.repartition(parts)
  }

  /** Build a synthetic asset table from any (id, string) source —
    * content is the utf-8 bytes; lets the multimodal path run on the
    * driver testdata without real media. */
  def syntheticAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("media_type"),
        lit(640).as("width"), lit(480).as("height"),
        lit(16000).as("sample_rate"), lit(1000L).as("duration_ms")).as("meta"))
}
