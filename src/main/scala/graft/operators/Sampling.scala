package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting and sampling for training-data pipelines.
  *
  * The split must be a pure function of the row key — not of
  * partitioning, row order, or a random stream — so that it is
  * reproducible across runs, engines and cluster sizes, and so a
  * document's assignment never changes when the corpus grows (the
  * property that prevents train/test leakage between pipeline runs).
  * Hash-bucket splitting on md5 gives exactly that, and is portable
  * enough to hash-match an SQL oracle.
  */
object Sampling {

  /** Deterministic hash-bucket split label: 'train' for the first
    * `trainSixteenths`/16 of md5 key space, else 'test'. */
  def splitLabel(idCol: Column, trainSixteenths: Int = 13): Column = {
    require(trainSixteenths > 0 && trainSixteenths < 16)
    val bound = "0123456789abcdef".charAt(trainSixteenths).toString
    when(substring(md5(idCol.cast("string")), 1, 1) < bound, "train")
      .otherwise("test")
  }

  def trainTestSplit(
      df: DataFrame, idCol: String,
      trainSixteenths: Int = 13): (DataFrame, DataFrame) = {
    val labeled = df.withColumn("split", splitLabel(col(idCol), trainSixteenths))
    (labeled.filter(col("split") === "train").drop("split"),
      labeled.filter(col("split") === "test").drop("split"))
  }

  /** Deterministic per-stratum downsampling: keep a row iff its key
    * hash falls in the stratum's keep-fraction of bucket space.
    * Unlike rand()-based sampleBy, re-runs and re-partitions keep the
    * exact same rows. Fractions are quantized to 1/256. */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 2), 16, 10)
      .cast("int")
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, frac)) =>
      acc || (col(stratumCol) === stratum &&
        bucket < math.round(frac * 256).toInt)
    }
    df.filter(keep)
  }
}
