package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineSimilarity, DotProduct, L2Distance, L2Norm, L2Normalize}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the vector kernel as
  * SQL functions so `spark.sql("SELECT cosine_similarity(a, b) ...")`
  * works on any session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "", "", "", "math_funcs", "4.0.0", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two vectors"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("l2_distance"),
      info("l2_distance", "l2_distance(a, b) - Euclidean distance (pgvector <->)"),
      (es: Seq[Expression]) => L2Distance(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - Euclidean norm"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    e.injectFunction((
      FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(a) - unit-normalized copy"),
      (es: Seq[Expression]) => L2Normalize(es.head)))
    // sketch kernels: constant-foldable int/long literals for the
    // parameters (SQL callers pass literals); arity/foldability/null
    // are validated here so misuse surfaces as a clean analysis error
    // naming the contract, not an internal exception
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(shingles, numHashes, seed) - MinHash sketch as array<bigint>"),
      (es: Seq[Expression]) => {
        // arity FIRST (before any es(i) access), then per-arg checks
        require(es.length == 3,
          s"minhash_signature(shingles, numHashes, seed) takes 3 arguments, got ${es.length}")
        def lit(i: Int, what: String): Number = {
          require(es(i).foldable,
            s"minhash_signature: $what must be a literal")
          es(i).eval() match {
            case n: Number => n
            case other => throw new IllegalArgumentException(
              s"minhash_signature: $what must be an integer literal, got $other")
          }
        }
        graft.functions.MinHashSignature(
          es.head, lit(1, "numHashes").intValue(), lit(2, "seed").longValue())
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (es: Seq[Expression]) => graft.functions.SimHash(es.head)))
  }
}
