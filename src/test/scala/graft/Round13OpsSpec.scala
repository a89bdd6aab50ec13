package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.DedupStreams

/** Round-13 operator specs: the m10 bounded-window fix (the round-12
  * verdict's one genuine unbounded-memory hazard), the streaming
  * pHash-state payload migration, and corrupt-container tolerance on
  * the zip walks. */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  /** One real WAV asset of `nSamples` 16-bit mono samples (sample i =
    * a deterministic ramp) — long enough to prove the decode bound. */
  private def wavAsset(id: Long, nSamples: Int): DataFrame = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((i * 37) % 20001) - 10000
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val s = spark; import s.implicits._
    Seq((id, bos.toByteArray)).toDF("asset_id", "content")
      .select(col("asset_id"), col("content"),
        struct(lit("audio").as("media_type"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(8000).as("sample_rate"),
          lit(1000L * nSamples / 8000).as("duration_ms")).as("meta"))
  }

  test("m10 bound: decodeWavWindows(maxWindows) stops EMITTING at the bound on a long asset") {
    val long = wavAsset(1L, 200000) // 25 s at 8 kHz — 200k windows at windowSamples=1
    val bounded = Multimodal.decodeWavWindows(long, windowSamples = 1,
      maxWindows = 66)
    assert(bounded.count() == 66,
      "decode must stop at maxWindows, not emit the full sample stream")
    assert(bounded.agg(max("window_number")).head.getInt(0) == 65)
    // and the bound is the decode loop, not a post-hoc filter: the
    // unbounded form really would have emitted every sample
    assert(Multimodal.decodeWavWindows(long, windowSamples = 1)
      .count() == 200000)
  }

  test("m10 bound: fingerprint unchanged by construction — long asset == its 66-window prefix") {
    val long = wavAsset(3L, 200000)
    val prefix = wavAsset(3L, 66)
    def fp(df: DataFrame) = Multimodal.audioFingerprint(df, windowSamples = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSeq
    assert(fp(long) == fp(prefix),
      "the 64 delta bits read only windows 0..65 — truncation is invisible")
    assert(fp(long).nonEmpty)
  }

  test("m10 bound: the window_number filter is IN the plan under the fingerprint aggregate") {
    val p = Multimodal.audioFingerprint(wavAsset(5L, 500), windowSamples = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("window_number") && p.contains("<= 65"),
      s"bounded-input filter missing from the fingerprint plan:\n${p.take(2000)}")
  }

  test("mergeMinChunks migration: a pre-payload state (h0..h3 only) unions with a payload delta") {
    val s = spark; import s.implicits._
    // round-11 on-disk state shape: chunks only
    val oldState = Seq((1L, 3, 3, 3, 3), (2L, 9, 9, 9, 9))
      .toDF("asset_id", "h0", "h1", "h2", "h3")
    // round-12+ batch delta: width/height payload rides along
    val delta = Seq((2L, 1, 1, 1, 1, 10, 20), (7L, 5, 5, 5, 5, 30, 40))
      .toDF("asset_id", "h0", "h1", "h2", "h3", "width", "height")
    val m = DedupStreams.mergeMinChunks(oldState, delta, Seq("asset_id"))
    assert(m.columns.toSet ==
      Set("asset_id", "h0", "h1", "h2", "h3", "width", "height"))
    val rows = m.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), Option(r.get(5)), Option(r.get(6))))).toMap
    // asset 1: only the pre-upgrade observation → null payload, not a failure
    assert(rows(1L) == ((3, None, None)))
    // asset 2: delta's chunks win the struct min (1 < 9) and its
    // payload rides along wholesale
    assert(rows(2L) == ((1, Some(10), Some(20))))
    // asset 7: delta-only, payload intact
    assert(rows(7L) == ((5, Some(30), Some(40))))
    // and the downstream m9 collapse ANALYZES against the migrated
    // state (the advisor's reported failure mode was an analysis
    // error on the missing columns)
    Multimodal.imageDedupFromHashes(m, maxDist = 3).collect()
    Caches.release(s)
  }

  test("corrupt zip container: zero rows for that asset, intact assets unaffected") {
    val s = spark; import s.implicits._
    val good = Multimodal.syntheticVideoAssets(
      Seq(7L).toDF("doc_id"), "doc_id").collect().head
    val goodBytes = good.getAs[Array[Byte]](1)
    // truncate a VALID container mid-entry — the real crawl artifact:
    // the zip walk hits unexpected EOF inside readAllBytes/getNextEntry
    val corrupt = goodBytes.take(goodBytes.length / 2)
    val assets = Seq((7L, goodBytes), (8L, corrupt))
      .toDF("asset_id", "content")
      .select(col("asset_id"), col("content"),
        struct(lit("video").as("media_type"), lit(1).as("width"),
          lit(1).as("height"), lit(null).cast("int").as("sample_rate"),
          lit(80L).as("duration_ms")).as("meta"))
    val fh = Multimodal.zipFrameHashes(assets, everyNth = 2)
      .groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fh.contains(7L) && fh(7L) > 0, "intact asset must still hash")
    assert(!fh.contains(8L), "corrupt container must contribute zero rows")
    val fs = Multimodal.sampleZipFrames(assets, everyNth = 2)
      .groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fs.contains(7L) && fs(7L) > 0)
    assert(!fs.contains(8L),
      "sampleZipFrames shares the corrupt-container contract")
  }
}
