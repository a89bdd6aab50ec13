package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous document ingestion: `readStream` over a documents
  * directory, with each micro-batch running the SAME import pipeline
  * as the batch CLI (model upsert, null-safe source upsert, chunk +
  * embed, append to the model_id-partitioned chunk store) through
  * `foreachBatch`.
  *
  * Design stance: streaming and batch ingest share ONE code path
  * (`cli.Demo.importDocs`), so stream == batch holds by construction
  * rather than by parallel maintenance of two pipelines —
  * StreamingSpec pins it anyway (same chunk set, same search results).
  * The store's append-only layout is what makes this safe:
  *  - upserts are insert-if-absent with null-safe keys, so a source
  *    seen in an earlier micro-batch is not re-inserted;
  *  - chunk ids are deterministic (doc_id, chunk_number) composites,
  *    so replays/speculation never mint conflicting ids;
  *  - chunk writes append; the small-file accumulation every streaming
  *    sink suffers is handled by `Catalog.compactChunks` exactly as
  *    for batch imports, and ANN indexes rebuild on fingerprint change
  *    (or extend via appendToLshIndex / Ivf.appendToIndex).
  *
  * At scale this is the file-arrival ingest loop: new parquet drops in
  * `docsDir` are discovered by the source, processed once (checkpoint
  * tracks files), and land queryable in the store. `maxFilesPerTrigger`
  * bounds micro-batch size — embedding is the per-row hot spot, so
  * batches should be sized to the executor budget, not to file counts.
  */
object StreamingIngest {

  /** Start the ingest stream over `docsDir` (parquet files with at
    * least doc_id + text; sidecar metadata columns optional). Runs
    * until all currently-available files are processed
    * (Trigger.AvailableNow) — pass a checkpoint dir to make repeated
    * invocations incremental across restarts. */
  def ingestStream(
      spark: SparkSession,
      docsDir: String,
      schema: StructType,
      store: String,
      model: String,
      dim: Int,
      maxTokens: Int,
      maxFilesPerTrigger: Int = 1,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
    val sink = src.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.cli.Demo.importDocs(spark, batch, store, model, dim, maxTokens)
      }
    checkpointDir.fold(sink)(d => sink.option("checkpointLocation", d)).start()
  }
}
