package graft.functions

import org.apache.spark.sql.Column

import graft.rag.Rag.TextGenerator

/** Pluggable embedder abstraction (SURVEY.md §2.4).
  *
  * The reference's embedding is two-stage: an LLM "priming" call whose
  * output text is appended to the input (E1, reference
  * `src/lib/embedding.py:27-55`), then the deterministic hash
  * embedding (E2). On hosts without CUDA the reference silently skips
  * E1 (`src/lib/llms.py:18-19`) — so the deterministic embedder IS the
  * reference behavior in the no-GPU case, and E1 is an optional
  * decorator here.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  /** Batch form — service-backed embedders override this with one
    * request per batch ([[HttpEmbedder]]); in-process embedders keep
    * the per-text default. `texts` contains no nulls (callers filter). */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
  final def embedColumn(c: Column): Column = {
    val self = this
    org.apache.spark.sql.functions
      .udf((t: String) => if (t == null) null else self.embed(t))
      .apply(c)
  }
}

/** E2: the canonical deterministic hash embedder. */
case class HashEmbedder(dim: Int = Embedding.DefaultDim) extends Embedder {
  def embed(text: String): Array[Float] = Embedding.embed(text, dim)
}

/** E1 decorator: prime the text through a TextGenerator (LLM analysis
  * prompt, temperature 0, short budget — the reference's parameters,
  * `src/lib/embedding.py:38-43`) and embed text + analysis. With the
  * deterministic stub generator the whole pipeline stays pure. */
case class PrimedEmbedder(
    base: Embedder,
    generator: TextGenerator,
    maxTokens: Int = 50) extends Embedder {
  def dim: Int = base.dim
  def embed(text: String): Array[Float] = {
    val prompt = s"Analyze and understand this text: $text"
    val analysis = generator.generate(prompt, maxTokens, temperature = 0.0)
    base.embed(s"$text\n$analysis")
  }
}
