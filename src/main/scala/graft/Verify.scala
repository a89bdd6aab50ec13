package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run each selected query against `sfDir`, write its result to
    * `outDir/<name>`, then dump `SparkEntry.oracleSql` as
    * `outDir/oracle_sql.json` (AFTER the queries ran — the v21-family
    * inlined-constant oracles are stashed at query time). Shared by
    * [[main]] (the driver's gate) and the in-suite Unicode fixture
    * gate (UnicodeFixtureGateSpec), so the CI gate exercises the REAL
    * dump path, not a parallel reimplementation. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      only: Set[String] = Set.empty): Unit = {
    new java.io.File(outDir).mkdirs()
    // dump-time oracle stashes survive across dump() calls in one JVM:
    // without this reset, a targeted dump that EXCLUDES a stashed query
    // would emit that query's oracle from the PREVIOUS dump's corpus
    // (advisor, round 12) — oracles must come only from queries that
    // ran in THIS dump
    graft.operators.TextQueries.resetOracleStashes()
    graft.operators.VectorQueries.resetOracleStashes()
    graft.operators.PipelineQueries.resetOracleStashes()
    // retired-recipe sidecars (superseded store prefixes) are garbage
    // the moment the recipe bumps — sweep them here so they never
    // accumulate across rounds; temp-dir-keyed sidecars from PREVIOUS
    // processes are equally unreachable (random temp names), except
    // the ones keyed to the corpus THIS dump runs against
    graft.store.AnnIndexes.gcRetired(spark)
    graft.store.AnnIndexes.gcTempKeyed(spark,
      keepKey = graft.store.AnnIndexes.keyOf(sfDir))
    // sequential by design: concurrent submission of the heavy queries
    // (pairwise joins + embedding pipelines) thrashes a single local
    // JVM (measured >4× slower than sequential at sf0.01)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries persist() shared projections internally; drop them so
      // the cache does not accumulate across the ~70-query sweep.
      // Caches.release additionally frees localCheckpoint blocks
      // (dup-cluster labels) that clearCache cannot see.
      Caches.release(spark)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), rest) = args.splitAt(2)
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration on one query without the ~70-query sweep)
    val only: Set[String] = rest.headOption
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.quietBoundedWindowWarnings()
    dump(spark, sfDir, outDir, only)
    spark.stop()
  }
}
