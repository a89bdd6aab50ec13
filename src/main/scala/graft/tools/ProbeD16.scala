package graft.tools
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextAnalysis
object ProbeD16 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = 3; val threshold = 0.4
    val spark = Tables.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables.load(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime()-t0)/1e9}%.2f"); r }
    // warmup scan
    time("warmup") { df.count() }
    val sets = df.select(col("doc_id").cast("long").as("id"),
      array_sort(transform(TextAnalysis.shinglesSeg(col("text"), n),
        s => xxhash64(s))).as("sh"))
    time("sets_once") { sets.count() }
    val toks = sets.select(col("id"), explode(col("sh")).as("tok"))
    time("toks_once") { toks.count() }
    val tokDf = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    time("tokdf") { tokDf.count() }
    val prefixes = toks.join(tokDf, "tok").groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
        s => s.getField("tok")).as("toks"))
      .select(col("id"), size(col("toks")).as("sz"),
        explode(slice(col("toks"), lit(1),
          size(col("toks")) - ceil(lit(threshold) * size(col("toks")) - lit(1e-9)).cast("int") + 1)).as("tok"))
    time("prefixes") { prefixes.count() }
    val pp = prefixes.persist(); pp.count()
    val cand = pp.as("a").join(pp.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("b.sz") >= lit(threshold) * col("a.sz") - lit(1e-9) &&
          col("a.sz") >= lit(threshold) * col("b.sz") - lit(1e-9))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    time("cand_from_persisted") { println("CANDRAW " + cand.count()) }
    val ver = cand
      .join(sets.select(col("id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sets.select(col("id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).as("ov"),
        size(col("a_sh")).as("sza"), size(col("b_sh")).as("szb"))
      .withColumn("jaccard",
        col("ov").cast("double") / (col("sza") + col("szb") - col("ov")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard").distinct()
    time("verify_total") { println("PAIRS " + ver.count()) }
    spark.stop()
  }
}
