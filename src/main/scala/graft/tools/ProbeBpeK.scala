package graft.tools

/** BPE merge-count cost curve (round 12): times EVERY training round
  * of `TextQueries.trainBpe` at a configurable k. In principle round
  * i re-segments every distinct word against i accumulated merges
  * (`bpeSegment` folds the merge list into the expression), so
  * expression work grows with i; this probe measures whether that —
  * or fixed per-round scheduling — dominates at a given vocab. The
  * declared t37 query trains k = 6 (BpeMergeCount); run this before
  * raising the constant:
  * `runMain graft.tools.ProbeBpeK [dir] [k]` (defaults sf0.1, k=24).
  *
  * MEASURED, round-12 build (local[32], quiet box): sf0.1 (31
  * distinct words) k=24 → every round 0.24–0.46 s, FLAT in i; sf1
  * (310 distinct words) k=12 → 0.36–0.55 s, flat again (round 1 adds
  * ~1 s of word-count build + cache both times). At these vocab
  * sizes the per-round cost is entirely the fixed two-job round
  * (argmax + 1-row collect) — bpeSegment's expression depth is not
  * yet visible, so raising k to a few dozen costs ~k × 0.4 s,
  * linearly. The curve shifts with DISTINCT-WORD count (the loop
  * runs over the vocab table, never the corpus), so a real web-scale
  * vocab is where depth-in-i would surface — re-run this probe there
  * before turning k up by orders of magnitude. */
object ProbeBpeK {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(24)
    val spark = graft.Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val words = graft.Caches.shared(
      graft.operators.TextQueries.bpeWordCountsOf(
        graft.Tables.balanced(
          graft.Tables.load(spark, dir, "documents"))))
    println(s"PROBE bpeK $dir distinct_words=${words.count()} k=$k")
    graft.operators.TextQueries.trainBpe(words, k,
      onRound = (i, m, sec) =>
        println(f"PROBE bpeK round=$i%2d ${sec}%6.2f s " +
          f"merge=(${m._1}%s,${m._2}%s) count=${m._3}%d"))
    graft.Caches.release(spark)
    spark.stop()
  }
}
