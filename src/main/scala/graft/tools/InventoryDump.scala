package graft.tools
/** Dump the registered query inventory as a markdown table (SURVEY.md
  * §2B-status source of truth — regenerate after adding queries).
  */
object InventoryDump {
  def main(args: Array[String]): Unit = {
    val all = graft.ops.Registry.all.sortBy(_.name)
    println(s"| # | query | oracle |")
    println(s"|---|---|---|")
    all.zipWithIndex.foreach { case (q, i) =>
      val o = if (q.oracle.isDefined) "DuckDB hash-match" else "rows-only (approx/binary)"
      println(s"| ${i + 1} | `${q.name}` | $o |")
    }
    System.err.println(s"total=${all.size} oracle=${all.count(_.oracle.isDefined)}")
  }
}
