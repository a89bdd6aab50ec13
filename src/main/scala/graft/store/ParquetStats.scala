package graft.store

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
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
  * statistics → None, and callers fall back to the scan. Bounds from
  * footers are exact min/max, but callers must only use them where
  * approximate bounds are CORRECTNESS-NEUTRAL (asofJoinSkewSafe's
  * bucket split is such a case — bounds shape skew resistance only).
  */
object ParquetStats {

  /** Per-FILE (min, max) of a physical INT64 column — the granularity
    * scan pruning operates at (a filter outside a file's range skips
    * it entirely via its footer). Files without usable stats are
    * omitted. Used by the layout specs to measure how sharply a
    * clustering scheme (sort vs Z-order) localizes each column. */
  def perFileLongBounds(
      spark: SparkSession, tablePath: String, colName: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val out = Seq.newBuilder[(Long, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
          && !n.startsWith(".")) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try {
          var lo = Long.MaxValue
          var hi = Long.MinValue
          var ok = false
          reader.getFooter.getBlocks.forEach { block =>
            block.getColumns.forEach { c =>
              if (c.getPath.toDotString == colName) {
                val s = c.getStatistics
                if (s != null && !s.isEmpty && s.hasNonNullValue)
                  (s.genericGetMin, s.genericGetMax) match {
                    case (mn: java.lang.Long, mx: java.lang.Long) =>
                      lo = math.min(lo, mn.longValue())
                      hi = math.max(hi, mx.longValue())
                      ok = true
                    case _ => ()
                  }
              }
            }
          }
          if (ok) out += ((lo, hi))
        } finally reader.close()
      }
    }
    out.result()
  }

  /** Merged (min, max) of a physical INT64 column across every parquet
    * file under `tablePath`, from footer statistics only. None if the
    * table is missing, empty, or any chunk lacks stats. */
  def longColumnBounds(
      spark: SparkSession, tablePath: String, colName: String): Option[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
            && !n.startsWith(".")) b += st.getPath
      }
      b.result()
    }
    if (files.isEmpty) return None
    var lo = Long.MaxValue
    var hi = Long.MinValue
    var rows = 0L
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        blocks.forEach { block =>
          rows += block.getRowCount
          var found = false
          block.getColumns.forEach { c =>
            if (c.getPath.toDotString == colName) {
              found = true
              val st = c.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue)
                return None // a chunk without stats poisons the merge
              (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  lo = math.min(lo, mn.longValue())
                  hi = math.max(hi, mx.longValue())
                case _ => return None // not a physical INT64 column
              }
            }
          }
          if (!found && block.getRowCount > 0) return None
        }
      } finally reader.close()
    }
    if (rows == 0 || lo > hi) None else Some((lo, hi))
  }
}
