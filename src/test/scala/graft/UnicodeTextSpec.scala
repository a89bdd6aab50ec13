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

  test("Unicode-version coupling probe: script assignments pinned") {
    // Every seg/BPE oracle assumes Java's Unicode Script property
    // agrees with DuckDB/RE2's for the classes both sides spell. Pin
    // one representative code point per enumerated script (plus the
    // Inherited combining-mark fallback) at the values the fixture
    // sweep was verified under: a JVM/ICU upgrade that moves one of
    // these fails HERE with a pointer to re-run the fixture sweep,
    // instead of silently shifting tokenizations out from under the
    // oracles.
    import java.lang.Character.{UnicodeScript => US}
    val pins = Seq(
      0x4E16 -> US.HAN, 0x3042 -> US.HIRAGANA, 0x30A2 -> US.KATAKANA,
      0xD55C -> US.HANGUL, 0x00E9 -> US.LATIN, 0x0414 -> US.CYRILLIC,
      0x03BB -> US.GREEK, 0x0627 -> US.ARABIC, 0x05D0 -> US.HEBREW,
      0x0915 -> US.DEVANAGARI, 0x0E01 -> US.THAI, 0x0531 -> US.ARMENIAN,
      0x10D0 -> US.GEORGIAN, 0x0995 -> US.BENGALI, 0x0BA4 -> US.TAMIL,
      0x0C24 -> US.TELUGU, 0x0C95 -> US.KANNADA, 0x0D15 -> US.MALAYALAM,
      0x0A95 -> US.GUJARATI, 0x0A15 -> US.GURMUKHI, 0x0B15 -> US.ORIYA,
      0x0D85 -> US.SINHALA, 0x1000 -> US.MYANMAR, 0x1780 -> US.KHMER,
      0x0E81 -> US.LAO, 0x1208 -> US.ETHIOPIC,
      0x0301 -> US.INHERITED)
    pins.foreach { case (cp, sc) =>
      assert(java.lang.Character.UnicodeScript.of(cp) == sc,
        f"U+$cp%04X moved off $sc — re-verify the fixture sweep")
    }
    // combining marks are Mn, not \p{L} — the documented NFD fallback
    assert(Character.getType(0x0301) == Character.NON_SPACING_MARK)
  }

  test("native SegTokens ≡ the SegPattern regex on random mixed-script text") {
    import org.scalacheck.Gen
    // alphabet stresses every classifier branch: the five whitespace
    // chars (incl. \x0B — the RE2 \s divergence), Han, Hiragana,
    // Katakana, Hangul, Latin/accented/Cyrillic, combining marks,
    // digits, punctuation, and a non-BMP surrogate-pair code point
    val alphabet: Seq[String] = Seq(
      " ", "\t", "\n", "\u000b", "\f", "\r",
      "世", "界", "引", "あ", "い", "ア", "カ", "한", "글",
      "a", "b", "é", "ß", "д", "λ", "ع", "ह",
      "́", "1", "9", ".", ",", "-", "№", "😀")
    val gen = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alphabet)).map(_.mkString))
    SparkTestSession.forAll(gen, n = 120) { s =>
      val row = Seq(Tuple1(s)).toDF("text")
        .select(TextAnalysis.segTokens(col("text")).as("native"),
          TextAnalysis.segTokensRegex(col("text")).as("regex"))
        .head()
      assert(row.getSeq[String](0) == row.getSeq[String](1),
        s"mismatch on: ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
    // empty + pure-whitespace + unspaced-CJK shape pins
    assert(Seq(Tuple1("")).toDF("text")
      .select(TextAnalysis.segTokens(col("text"))).head().getSeq[String](0)
      .isEmpty)
    assert(Seq(Tuple1(" \t ")).toDF("text")
      .select(TextAnalysis.segTokens(col("text"))).head().getSeq[String](0)
      .isEmpty)
    assert(Seq(Tuple1("世界です한글ab")).toDF("text")
      .select(TextAnalysis.segTokens(col("text"))).head().getSeq[String](0)
      == Seq("世", "界", "です", "한글", "ab"))
  }

  test("round-11 scripts segment as RUNS, not per-letter (BpePattern)") {
    // Armenian/Bengali/Tamil words were one letter per piece under the
    // old \p{L} catch-all; they are single-script runs now. Virama /
    // dependent-vowel marks carry their script's property, so a full
    // word stays one run.
    assert(pieces("Հայերեն բառ") == Seq("Հայերեն", " բառ"))
    assert(pieces("বাংলা শব্দ") == Seq("বাংলা", " শব্দ"))
    assert(pieces("தமிழ் சொல்") == Seq("தமிழ்", " சொல்"))
    // mixed with the established families: boundaries still split
    assert(pieces("abcՀայ123") == Seq("abc", "Հայ", "123"))
    // the java reference agrees piece-for-piece (the Re2 twin is held
    // by the fixture sweep)
    val pat = java.util.regex.Pattern.compile(TextAnalysis.BpePattern)
    Seq("Հայերեն բառ", "বাংলা শব্দ", "தமிழ் சொல்").foreach { s =>
      val m = pat.matcher(s)
      val expected = Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => m.group()).toVector
      assert(pieces(s) == expected && expected.mkString == s, s"sample: $s")
    }
  }

  test("NfkcCasefold: compatibility + case collapse; ASCII fast path") {
    import graft.functions.NfkcCasefold
    val rows = Seq(
      ("lig", "ﬁle"), ("wide", "Ａｂｃ"), ("unit", "5㎏"),
      ("case", "Épsilon"), ("nfd", "caf" + "e" + "́"),
      ("ascii", "Plain ASCII"), ("eszett", "straße"))
      .toDF("k", "text")
      .select(col("k"), NfkcCasefold(col("text")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("lig") == "file")
    assert(rows("wide") == "abc")
    assert(rows("unit") == "5kg")
    assert(rows("case") == "épsilon")
    assert(rows("nfd") == "café") // composed AND already lowercase
    assert(rows("ascii") == "plain ascii")
    // SIMPLE fold, documented: ß is its own lowercase (no ss expansion)
    assert(rows("eszett") == "straße")
    // idempotence — canonical keys must be fixed points
    val twice = Seq("ﬁle Ａｂｃ ㎏ É").toDF("text")
      .select(NfkcCasefold(NfkcCasefold(col("text"))) ===
        NfkcCasefold(col("text"))).head().getBoolean(0)
    assert(twice)
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
