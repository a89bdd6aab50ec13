package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Round-8 Unicode-tokenization gate: the BPE pre-tokenizer and every
  * tokenizer-adjacent kernel must treat non-ASCII letters as LETTERS
  * (Unicode \p{L}/\p{N} classes), not punctuation — the former ASCII
  * classes split "café" at the accent, which silently corrupts token
  * budgets, BPE training, shingles, and quality scores on any real
  * multilingual corpus (the reference's own Gutenberg EPUBs carry
  * non-ASCII typography). Cross-engine portability of the new classes
  * is held by the fixture sweep (tools/gen_unicode_fixture.py + a full
  * Verify/check_correctness run — see README) plus the java-regex
  * reference comparison below; these specs pin the JVM-side semantics.
  */
class UnicodeTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pieces(s: String): Seq[String] = {
    Seq(s).toDF("text")
      .select(TextAnalysis.bpePieces(col("text")).as("p"))
      .collect().head.getSeq[String](0)
  }

  test("café tokenizes as ONE letter run (the round-8 pin)") {
    assert(pieces("café") == Seq("café"))
    assert(pieces("un café crème") == Seq("un", " café", " crème"))
  }

  test("accented, CJK and mixed runs match the java.util.regex reference") {
    val samples = Seq(
      "café 世界 naïve 42x, done",
      "straße połącz датенменге Ελλάδα",
      "数据引擎123abc!",
      "naïve-déjà vu №5")
    val pat = java.util.regex.Pattern.compile(TextAnalysis.BpePattern)
    samples.foreach { s =>
      val m = pat.matcher(s)
      val expected = Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => m.group()).toVector
      assert(pieces(s) == expected, s"sample: $s")
      // and the identity property holds on non-ASCII text too
      assert(expected.mkString == s)
    }
    // the concrete shape, pinned: digits are one run, the letter 'x'
    // after them starts a new run WITHOUT the space (leftmost-first),
    // and Han segments PER CHARACTER (round 9 — the unspaced-CJK
    // fallback; only the first char absorbs the preceding space)
    assert(pieces("café 世界 naïve 42x, done") ==
      Seq("café", " 世", "界", " naïve", " 42", "x", ",", " done"))
  }

  test("charPairs / bpeSegment are character-based on non-ASCII words") {
    // charPairs: adjacent CHARACTER pairs — é is one character
    val cp = Seq("café 世界").toDF("text")
      .select(TextAnalysis.charPairs(col("text")).as("p"))
      .collect().head.getSeq[String](0)
    // 世界 is two PER-CHAR words after round 9's script segmentation —
    // single-char words contribute no pairs (no cross-Han merges)
    assert(cp == Seq("ca", "af", "fé"))
    // bpeSegment: seeds from single characters and merges apply to
    // multi-byte letters exactly like ASCII ones
    val seg = Seq("café").toDF("w")
      .select(TextAnalysis.bpeSegment(col("w"),
        Seq(("c", "a"), ("f", "é"), ("ca", "fé"))).as("p"))
      .collect().head.getSeq[String](0)
    assert(seg == Seq("café"))
  }

  test("tokens / shingles / fingerprint are byte-order-free on Unicode") {
    val df = Seq("世界 datenmenge café café straße").toDF("text")
    val toks = df.select(TextAnalysis.tokens(col("text"))).collect()
      .head.getSeq[String](0)
    assert(toks == Seq("世界", "datenmenge", "café", "café", "straße"))
    val sh = df.select(TextAnalysis.shingles(col("text"), 2)).collect()
      .head.getSeq[String](0)
    assert(sh.contains("café café") && sh.contains("世界 datenmenge"))
    // fingerprint normalizes case Unicode-aware: CAFÉ and café collide
    val fps = Seq("CAFÉ straße", "café straße").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).distinct().count()
    assert(fps == 1)
  }

  test("NfcNormalize: decomposed → precomposed, ASCII fast-path, null-safe") {
    import graft.functions.NfcNormalize
    val nfd = "caf" + "e" + "́" // e + combining acute (5 chars)
    val nfc = "café" // precomposed é (4 chars)
    val rows = Seq(("a", nfd), ("b", nfc), ("c", "plain ascii"), ("d", null))
      .toDF("k", "text")
      .select(col("k"), NfcNormalize(col("text")).as("n"),
        length(NfcNormalize(col("text"))).as("len"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toMap
    assert(rows("a") == (Some(nfc), 4)) // normalized, 5 -> 4 chars
    assert(rows("b") == (Some(nfc), 4)) // already NFC: unchanged
    assert(rows("c") == (Some("plain ascii"), 11))
    assert(rows("d") == (None, -1)) // null-intolerant propagation
    // the t40 semantics: NFD and NFC spellings collide post-normalize
    val fps = Seq(nfd, nfc).toDF("text")
      .select(md5(trim(regexp_replace(lower(
        NfcNormalize(col("text"))), "\\s+", " "))))
      .distinct().count()
    assert(fps == 1)
  }

  test("t39 dominant-script argmax ties break to the larger script name") {
    // equal latin/cyrillic counts -> struct-max takes 'latin'
    // (lexicographically larger), matching the oracle's CASE chain
    val r = SparkEntry.queries("t39_script_mix")(spark,
      "/root/testdata/sf0.001").limit(0) // plan compiles against real data
    assert(r.columns.toSeq ==
      Seq("doc_id") ++ graft.functions.ScriptCountsKernel.FieldNames
        :+ "dominant")
    val mixed = Seq((1L, "abc где"), (2L, "мир мир"), (3L, "123 456"))
      .toDF("doc_id", "text")
    val got = mixed.select(col("doc_id"),
        array_max(array(Seq("Latin", "Cyrillic").map(sc =>
          struct(length(regexp_replace(col("text"), s"[^\\p{Is$sc}]", ""))
            .as("c"), lit(sc.toLowerCase).as("s"))): _*)).getField("s")
          .as("dom"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "latin") // 3 == 3 tie -> latin
    assert(got(2L) == "cyrillic")
  }

  test("quality/repetition kernels run clean over the unicode fixture shape") {
    // a miniature of the fixture recipe: accented swaps + CJK tails
    val docs = Seq(
      (0L, "the rápido mergé 世界 数据 引擎 世界"),
      (1L, "straße straße straße straße straße"),
      (2L, "plain ascii text stays plain")).toDF("doc_id", "text")
    val rep = docs.select(col("doc_id"),
        TextAnalysis.repetitionStats(col("text"), 2).as("r"))
      .orderBy("doc_id").collect()
    // doc 1: "straße straße" bigram repeats 4 times -> dupchars > 0
    assert(rep(1).getStruct(1).getLong(1) > 0)
    // doc 2 has no repeated bigram
    assert(rep(2).getStruct(1).getLong(1) == 0)
    val q = docs.select(TextAnalysis.qualityScore(col("text"))).collect()
    assert(q.forall(r => r.getDouble(0) >= 0 && r.getDouble(0) <= 1))
  }
}
