package graft.tools

import graft.{Bench, SparkEntry}

/** Prints the compact-line key-abbreviation map (full name → compact key)
  * as a markdown table for BASELINE.md's appendix, plus which ladder rung
  * the current query count lands on — the single source of truth is
  * Bench.abbrevKeys, so the published appendix can never drift from the
  * code (regenerating this output is part of the round close). */
object CompactKeys {
  def main(args: Array[String]): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val m = Bench.abbrevKeys(names)
    val (line, usedAbbrev) = Bench.compactLine(
      names.map(n => (n, 99.99)), Map.empty[String, Int], "sfX")
    println(s"query count: ${names.size}; pessimistic compact line: " +
      s"${line.length} chars; abbreviated keys in use: $usedAbbrev")
    println()
    // only rows where the abbreviation differs from the prefixless name
    val changed = names.filter(n => m(n) != n.stripPrefix("q_"))
    println("| full name | compact key |")
    println("|---|---|")
    changed.foreach(n => println(s"| ${n.stripPrefix("q_")} | ${m(n)} |"))
    println(s"\n(${names.size - changed.size} short names pass through unchanged)")
  }
}
