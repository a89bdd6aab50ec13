package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val assets = Multimodal.syntheticAssets(
    Tables.load(spark, "/root/testdata/sf0.001", "documents"), "doc_id", "text")

  test("asset table has the declared schema") {
    assert(assets.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(assets.select("meta.media_type").distinct().count() == 3)
  }

  test("feature extraction: schema, determinism, batch independence") {
    val f1 = Multimodal.extractFeatures(assets, featureDim = 8, batchSize = 32)
    val f2 = Multimodal.extractFeatures(assets.repartition(7),
      featureDim = 8, batchSize = 3)
    assert(f1.schema == Multimodal.FeatureSchema)
    val m1 = f1.collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val m2 = f2.collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    // results must not depend on partitioning or batch boundaries
    assert(m1 == m2)
    assert(m1.values.forall(_.length == 8))
    // n_bytes matches the utf-8 content length
    val nb = f1.select("asset_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = assets.select(col("asset_id"), length(col("content")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nb == want)
  }

  test("frame sampling explodes only video assets with ordinals") {
    val frames = Multimodal.sampleFrames(assets, everyNth = 50)
    val perAsset = frames.groupBy("asset_id").count()
    val videoIds = assets.filter(col("meta.media_type") === "video")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(perAsset.collect().map(_.getLong(0)).toSet == videoIds)
    val one = frames.filter(col("asset_id") === videoIds.head)
      .orderBy("frame_number").collect()
    assert(one.map(_.getInt(1)).toSeq == (0 until one.length))
    assert(one.map(_.getInt(2)).toSeq == (0 until one.length).map(_ * 50))
  }

  test("audio windows tile each asset's bytes exactly, last window partial") {
    val win = 25
    val got = Multimodal.audioWindows(assets, windowBytes = win)
      .groupBy("asset_id")
      .agg(sum("window_len").as("covered"),
        count(lit(1)).as("n_win"),
        max("start_byte").as("last_start"))
    val sizes = assets.filter(col("meta.media_type") === "audio")
      .select(col("asset_id"), length(col("content")).as("n"))
    val joined = got.join(sizes, "asset_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (covered, nWin, lastStart, n) =
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))
      assert(covered == n, s"windows must cover all $n bytes, got $covered")
      assert(nWin == (n + win - 1) / win)
      assert(lastStart == (nWin - 1) * win)
    }
  }

  test("byte-budget repartitioning sizes partitions by content bytes") {
    val re = Multimodal.repartitionByBytes(assets, targetBytesPerPartition = 4096)
    assert(re.rdd.getNumPartitions >= 2,
      s"expected multiple partitions, got ${re.rdd.getNumPartitions}")
    assert(re.count() == assets.count())
  }
}
