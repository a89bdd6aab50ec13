package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-bounded document chunking + enrichment (SURVEY.md §2.3 C1/C2).
  *
  * The reference chunks via docling's HybridChunker with a HF tokenizer
  * cap (reference `src/lib/documents.py:67-78`; lib default 512 tokens,
  * import path passes 1536 — `cli/import_doc.py:50`). The engine-native
  * spec is a deterministic whitespace-token chunker: split on single
  * spaces, group into runs of `maxTokens`, re-join with single spaces.
  * `maxTokens` is a parameter (both reference defaults representable).
  *
  * Spark-first shape: the chunker is a pure `text → array<string>`
  * expression built from built-in higher-order functions (NO UDF — the
  * whole pipeline stays in whole-stage codegen), exploded with
  * `posexplode` so the chunk ordinal (C2's `chunk_number`) falls out of
  * the generator rather than a window function. At 100 TB this is a
  * narrow map — no shuffle, no state.
  */
object Chunker {
  val LibDefaultMaxTokens = 512 // reference src/lib/documents.py:19
  val ImportPathMaxTokens = 1536 // reference cli/import_doc.py:50

  /** Pure-Scala reference implementation (used by tests and the
    * straight-line oracle): tokens = text split on ' '; chunks = groups
    * of `maxTokens` tokens re-joined with ' '. */
  def chunkText(text: String, maxTokens: Int): Vector[String] =
    if (text == null) Vector.empty
    else text.split(" ", -1).grouped(maxTokens).map(_.mkString(" ")).toVector

  /** Column form via built-in functions only: deterministic, codegen'd.
    * tokens(text) = split(text, ' '); chunk i = slice + array_join. */
  def chunksCol(text: Column, maxTokens: Int): Column =
    // bind the split once: `slice(toks, ...)` inside the lambda would
    // otherwise re-split the document per chunk (no CSE across HOF
    // lambdas — see TextAnalysis.letBound)
    graft.operators.TextAnalysis.letBound(split(text, " ", -1)) { toks =>
      // number of chunks = ceil(n / maxTokens); build [0, nChunks) and
      // slice the token array per chunk index.
      val nChunks = ceil(size(toks).cast("double") / maxTokens).cast("int")
      transform(
        sequence(lit(0), greatest(nChunks, lit(1)) - 1),
        i => array_join(slice(toks, i * maxTokens + 1, lit(maxTokens)), " "))
    }

  /** C1+C2: explode a documents DataFrame into enriched chunk rows.
    * Input must have `idCol` and `textCol`; output adds `chunk_number`
    * (0-based, the posexplode ordinal) and `chunk_text`, and keeps all
    * other columns (document metadata travels with each chunk). */
  def chunkDocuments(
      docs: DataFrame,
      textCol: String = "text",
      maxTokens: Int = LibDefaultMaxTokens,
      tokenizerModel: String = "graft/whitespace-v1"): DataFrame = {
    docs
      .select(
        col("*"),
        posexplode(chunksCol(col(textCol), maxTokens)).as(Seq("chunk_number", "chunk_text")))
      .drop(textCol)
      .withColumn("chunk_size", size(split(col("chunk_text"), " ", -1)))
      .withColumn("chunk_tokenizer_model", lit(tokenizerModel))
  }
}
