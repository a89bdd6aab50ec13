package graft.tools

/** m7 cost split probe: WAV encode (asset build) vs decode+window —
  * run ad hoc with `runMain graft.tools.ProbeM7 [sfDir]`. */
object ProbeM7 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Tables.session("local[8]", 8)
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(s, dir, "documents").select("doc_id")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val assets = graft.multimodal.Multimodal.syntheticWavAssets(docs, "doc_id")
    time("encode-only cold")(assets.count())
    time("encode-only warm")(assets.count())
    val dec = graft.multimodal.Multimodal.decodeWavWindows(assets, 32)
    time("encode+decode cold")(dec.count())
    time("encode+decode warm")(dec.count())
  }
}
