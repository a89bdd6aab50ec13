package graft.store

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.SparkSession

/** Footer-statistics reader: column min/max from parquet metadata,
  * no data scan.
  *
  * The scale use: operators that only need a column's RANGE (as-of
  * time-range bucketing, range-partition planning) shouldn't pay a
  * full pass over both inputs to learn it. Parquet row-group footers
  * already carry min/max per column chunk; merging them is O(files)
  * metadata reads — at 100 TB that's thousands of footer fetches, not
  * a table scan. (Spark's own aggregate pushdown covers this only for
  * DSv2 scans of bare MIN/MAX queries; this helper gives operators the
  * same information mid-plan.)
  *
  * Conservative by construction: any file/chunk without usable
  * statistics → the file (per-file form) or the whole merge (merged
  * form) is discarded, and callers fall back to the scan. Bounds from
  * footers are exact min/max, but callers must only use them where
  * approximate bounds are CORRECTNESS-NEUTRAL (asofJoinSkewSafe's
  * bucket split is such a case — bounds shape skew resistance only).
  */
object ParquetStats {

  /** Data files under `root`, recursively (skips `_`/`.` entries). */
  private def listParquetFiles(fs: FileSystem, root: Path): Seq[Path] = {
    val b = Seq.newBuilder[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
          && !n.startsWith(".")) b += st.getPath
    }
    b.result()
  }

  /** Per-file outcome of merging one column's chunk statistics.
    * Mutable accumulator so the per-chunk step is a plain method call —
    * no non-local `return` inside the parquet API's Java lambdas (which
    * only works via NonLocalReturnControl and is gone in Scala 3). */
  private final class BoundsAcc(colName: String) {
    var lo: Long = Long.MaxValue
    var hi: Long = Long.MinValue
    var rows: Long = 0L
    var sawValue = false
    /** False once ANY populated row group lacks usable INT64 stats for
      * the column — the conservative contract both entry points share. */
    var allChunksHaveStats = true

    def addBlock(columns: java.util.List[ColumnChunkMetaData], rowCount: Long): Unit = {
      rows += rowCount
      columns.asScala.find(_.getPath.toDotString == colName) match {
        case None =>
          if (rowCount > 0) allChunksHaveStats = false
        case Some(c) =>
          val st = c.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue)
            allChunksHaveStats = false
          else (st.genericGetMin, st.genericGetMax) match {
            case (mn: java.lang.Long, mx: java.lang.Long) =>
              lo = math.min(lo, mn.longValue())
              hi = math.max(hi, mx.longValue())
              sawValue = true
            case _ => allChunksHaveStats = false // not a physical INT64 column
          }
      }
    }

    def result: Option[(Long, Long)] =
      if (allChunksHaveStats && sawValue && rows > 0 && lo <= hi) Some((lo, hi))
      else None
  }

  /** Merged (min, max) of one file's chunk stats; None unless EVERY
    * populated row group carried usable stats (a file with some
    * stat-less chunks would otherwise report understated bounds). */
  private def fileBounds(
      conf: org.apache.hadoop.conf.Configuration, f: Path, colName: String,
      acrossFiles: BoundsAcc = null): Option[(Long, Long)] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
    try {
      val acc = new BoundsAcc(colName)
      reader.getFooter.getBlocks.asScala.foreach { block =>
        acc.addBlock(block.getColumns, block.getRowCount)
      }
      if (acrossFiles != null) {
        acrossFiles.rows += acc.rows
        if (!acc.allChunksHaveStats) acrossFiles.allChunksHaveStats = false
        if (acc.sawValue) {
          acrossFiles.lo = math.min(acrossFiles.lo, acc.lo)
          acrossFiles.hi = math.max(acrossFiles.hi, acc.hi)
          acrossFiles.sawValue = true
        }
      }
      acc.result
    } finally reader.close()
  }

  /** Per-FILE (min, max) of a physical INT64 column — the granularity
    * scan pruning operates at (a filter outside a file's range skips
    * it entirely via its footer). Files where any populated row group
    * lacks stats are omitted entirely, mirroring longColumnBounds'
    * conservative contract. Used by the layout specs to measure how
    * sharply a clustering scheme (sort vs Z-order) localizes a
    * column. */
  def perFileLongBounds(
      spark: SparkSession, tablePath: String, colName: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Nil
    else listParquetFiles(fs, root).flatMap(f => fileBounds(conf, f, colName))
  }

  /** Exact row count of a parquet table from footer block counts
    * alone — zero Spark jobs, zero data pages read (block row counts
    * are mandatory footer metadata, unlike column statistics). None if
    * the table is missing or has no data files. The driver reads one
    * footer per file: at 100 TB that is O(files) metadata RPCs — the
    * same cost the scan planner already pays — not a cluster job. */
  def rowCount(spark: SparkSession, tablePath: String): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) None
    else {
      val files = listParquetFiles(fs, root)
      if (files.isEmpty) None
      else Some(files.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }.sum)
    }
  }

  /** Merged (min, max) of a physical INT64 column across every parquet
    * file under `tablePath`, from footer statistics only. None if the
    * table is missing, empty, or any chunk lacks stats. */
  def longColumnBounds(
      spark: SparkSession, tablePath: String, colName: String): Option[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) None
    else {
      val files = listParquetFiles(fs, root)
      if (files.isEmpty) None
      else {
        val acc = new BoundsAcc(colName)
        val it = files.iterator
        // a single stat-less chunk poisons the merge — stop reading footers
        while (it.hasNext && acc.allChunksHaveStats) {
          fileBounds(conf, it.next(), colName, acrossFiles = acc)
          ()
        }
        acc.result
      }
    }
  }
}
