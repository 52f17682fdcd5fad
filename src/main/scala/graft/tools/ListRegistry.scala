package graft.tools

/** Prints the full declared registry (sorted), marking oracle-bearing
  * queries — the generator for SURVEY.md §2's registry table. */
object ListRegistry {
  def main(args: Array[String]): Unit = {
    val oracles = graft.SparkEntry.oracleSql.keySet
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    println(s"total=${names.size} oracle=${names.count(oracles)} " +
      s"no_oracle=${names.count(n => !oracles(n))}")
    names.grouped(4).foreach { g =>
      println(g.map(n =>
        (if (oracles(n)) n else s"$n*").padTo(30, ' ')).mkString)
    }
    println("(* = no-oracle: scalatest/property-verified)")
  }
}
