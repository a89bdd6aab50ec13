#!/usr/bin/env python3
"""Non-ASCII fixture generator (round-8 Unicode-tokenization gate).

Usage: python3 tools/gen_unicode_fixture.py [srcSfDir] [outDir]

Copies every table of a driver testdata SF dir verbatim EXCEPT
`documents.parquet`, whose text gets deterministic Unicode pressure:

  - doc_id % 3 == 0: common corpus words swapped for accented variants
    ("merge"->"mergé", "fast"->"rápido", "join"->"połącz",
     "data"->"datenmenge", "big"->"straße")
  - doc_id % 7 == 0: a CJK tail " 世界 数据 引擎 世界" appended
  - n_chars recomputed (the column is derived from text in the
    driver's recipe, so the invariant n_chars = len(text) must hold)

Everything else (doc_id, lang, source, row count/order) is unchanged,
so EVERY declared query can run against the fixture and its DuckDB
oracle recomputes from the same mutated table — a full
Verify + tools/check_correctness.py sweep over this dir proves the
whole text family (tokenizers, shingles, BPE train/encode, Gopher
stats, NB language ID, quality scores, dedup) is Unicode-clean in
BOTH engines, not just ASCII-coincidentally portable.
"""
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_unifix"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import os
os.makedirs(out, exist_ok=True)
for t in TABLES:
    if t == "documents":
        continue
    # copy verbatim (file-level, keeps the driver's parquet footers —
    # s4's stats fast path reads them)
    s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
    if os.path.isdir(s):
        shutil.copytree(s, d, dirs_exist_ok=True)
    else:
        shutil.copyfile(s, d)

SWAPS = [("merge", "mergé"), ("fast", "rápido"), ("join", "połącz"),
         ("data", "datenmenge"), ("big", "straße")]
repl = "text"
for a, b in SWAPS:
    # whole-token replace: the corpus is single-space-joined tokens
    repl = (f"array_to_string(list_transform(string_split({repl}, ' '),"
            f" t -> CASE WHEN t = '{a}' THEN '{b}' ELSE t END), ' ')")

# decomposed form: 'e' + U+0301 combining acute — byte-different from
# the precomposed 'é' swaps above, NFC-identical (exercises t40's
# changed=true branch); %41 docs become CJK-dominant (t39's 'han'
# branch); %43 docs get Cyrillic+Greek runs
NFD_WORD = "caf" + "e" + "\u0301"  # e + combining acute; NFC -> caf\u00e9
# Round 9: %37 docs become UNSPACED CJK — no word delimiter at all
# (real Chinese/Japanese), including a mixed Kana/Hangul doc — the
# hardest multilingual case: every tokenizer-semantic operator must
# segment these per-script/per-char identically in both engines, and
# the two variants share an unspaced Han passage ('世界数据引擎模型训练')
# so the winnowing/dedup families see real cross-doc CJK structure.
UNSPACED_A = "世界数据引擎模型训练分布式查询优化器批处理流水线"
UNSPACED_B = "数据引擎です処理パイプラインハロー한글분산처리世界数据引擎模型训练"
# Round 11 (late): %31 docs get ASTRAL + FORMAT-CHAR pressure — an
# emoji and MATHEMATICAL SCRIPT letters (both beyond the BMP: Java
# regex must treat the surrogate PAIR as one code point, as RE2 does
# one UTF-8 sequence) plus a ZERO WIDTH SPACE embedded inside a word
# (a Cf format char: not a letter, not whitespace, in BOTH engines'
# classes — crawl text is full of them).
# Round 11 (late): %29 docs get LINE-ENDING pressure — a CRLF-joined
# tail line plus a trailing stray \r (the c4Clean/\z class: Java's $
# matches before a trailing \r, RE2's does not, and line splitting
# must treat \r?\n identically in both engines).
# Round 11: %17 docs get COMPATIBILITY + case pressure (the t42
# canonical-key class: ligature ﬁ, full-width Ａｂｃ, ㎏, uppercase
# accents) and %19 docs get run-enumerated alphabetic scripts
# (Armenian/Bengali/Tamil — the BpePattern round-11 additions; under
# the old catch-all these segmented one letter per piece).
ASTRAL = ("\U0001F44D\U0001D49C\U0001D4C1\U0001D4C5"  # emoji + math script
          " zw\u200bword")  # ZERO WIDTH SPACE inside a word (explicit escape)
COMPAT = "ﬁle Ａｂｃ ㎏ Épsilon STRAßE"
SCRIPTS = "Հայերեն բառ বাংলা শব্দ தமிழ் சொல்"
con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT doc_id,
         CASE WHEN doc_id % 37 = 0 AND doc_id % 2 = 0 THEN '{UNSPACED_A}'
              WHEN doc_id % 37 = 0 THEN '{UNSPACED_B}'
              WHEN doc_id % 41 = 0 THEN '世界 数据 引擎 模型 训练 数据 世界 引擎'
              WHEN doc_id % 43 = 0 THEN t2 || ' Москва Ελλάδα текст λόγος'
              WHEN doc_id % 31 = 0
                THEN t2 || ' {ASTRAL}'
              WHEN doc_id % 29 = 0
                THEN t2 || chr(13) || chr(10) ||
                     'crlf tail line ends here.' || chr(13)
              WHEN doc_id % 17 = 0 THEN t2 || ' {COMPAT}'
              WHEN doc_id % 19 = 0 THEN t2 || ' {SCRIPTS}'
              WHEN doc_id % 13 = 0 THEN t2 || ' {NFD_WORD}'
              WHEN doc_id % 7 = 0 THEN t2 || ' 世界 数据 引擎 世界'
              ELSE t2 END AS text,
         lang, source, 0 AS n_chars
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN {repl} ELSE text END AS t2,
           lang, source
    FROM '{src}/documents.parquet'
  ) ORDER BY doc_id
) TO '{out}/_docs_tmp.parquet' (FORMAT PARQUET)
""")
# n_chars = length(text) invariant, recomputed after all mutations
con.sql(f"""
COPY (
  SELECT doc_id, text, lang, source, length(text) AS n_chars
  FROM '{out}/_docs_tmp.parquet' ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
os.remove(f"{out}/_docs_tmp.parquet")
n = con.sql(f"""SELECT count(*) FROM '{out}/documents.parquet'
  WHERE text != regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')""").fetchone()[0]
tot = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
print(f"unicode fixture at {out}: {n}/{tot} docs carry non-ASCII text")
