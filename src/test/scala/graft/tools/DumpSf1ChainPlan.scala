package graft.tools

/** Dev dump: the sf1 chain-at-a-time oracle plan (the composite
  * d22/m15/g10 replays, staged one chain per statement) as JSON for
  * tools/sf1_chain_oracle.py. Usage:
  *   sbt "Test/runMain graft.tools.DumpSf1ChainPlan /tmp/chain_plan.json"
  */
object DumpSf1ChainPlan extends App {
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  val plan: Map[String, Seq[(String, String)]] =
    graft.operators.PipelineQueries.sf1ChainPlan ++
      graft.operators.GraphQueries.sf1ChainPlan ++
      graft.operators.TextQueries.sf1ChainPlan

  val json = plan.toSeq.sortBy(_._1).map { case (q, chains) =>
    val arr = chains.map { case (n, sql) =>
      s"""[\"${esc(n)}\", \"${esc(sql)}\"]"""
    }.mkString("[", ", ", "]")
    s"""\"${esc(q)}\": $arr"""
  }.mkString("{", ", ", "}")

  val out = args.headOption.getOrElse("/tmp/chain_plan.json")
  java.nio.file.Files.write(java.nio.file.Paths.get(out),
    json.getBytes("UTF-8"))
  println(s"wrote $out (${plan.size} queries)")
}
