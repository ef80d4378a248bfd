package graft.tools

import org.apache.spark.sql.DataFrame

/** Canonical content checksum for golden-pinning query results that have
  * no SQL-expressible DuckDB oracle (signature dedups, the ANN ladder,
  * packing, trained-model scoring, perceptual hashes). Column-name-sorted
  * and row-sorted like the driver's hash gate, so the pin is independent
  * of column order, row order, and partitioning; doubles render through
  * `java.lang.Double.toString` so the pin is bitwise-exact. QueriesSpec
  * commits (row count, checksum) per query — a silent semantic drift in
  * the no-oracle family then fails `sbt test` loudly.
  */
object Golden {
  private def render(v: Any): String = v match {
    case null => "␀"
    case d: java.lang.Double => java.lang.Double.toString(d)
    case f: java.lang.Float => java.lang.Float.toString(f)
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case a: scala.collection.Seq[_] => a.map(render).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(render).mkString("(", ",", ")")
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => render(k) + ":" + render(x) }.sorted.mkString("{", ",", "}")
    case other => other.toString
  }

  /** (rows, 16-hex-char md5) of a result's canonical form. */
  def checksum(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted
    val proj = df.select(cols.head, cols.tail: _*)
    val lines = proj.collect().map(_.toSeq.map(render).mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    (lines.length.toLong, md.digest().take(8).map(b => f"$b%02x").mkString)
  }

  /** The driver-untested (`no_oracle`) query set QueriesSpec pins —
    * DERIVED from the registration maps (r20: the hand-maintained list
    * had drifted to the r18 state, still carrying the five rows the r19
    * checker oracles moved out), so the generator and the pin-set test
    * can never disagree about membership. */
  def NoOracle: Seq[String] =
    (graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet)
      .toSeq.sorted

  /** The corpus the COMMITTED pins bind: QueriesSpec's pin map was
    * generated at exactly this scale factor and asserts it runs against
    * the same one — regenerating pins against a different sf would
    * otherwise silently rebind them to the wrong corpus and mask drift
    * (r10 verdict, residual docs nit). */
  val PinSf = "/root/testdata/sf0.001"

  /** Second pin corpus (r12 verdict #9): pins are the ONLY net under
    * the no-oracle family, so a drift that happens to cancel at one
    * tiny sf (a swapped pair, an sf-correlated constant) needs a second
    * independent corpus to trip on. QueriesSpec commits a map per sf. */
  val PinSf2 = "/root/testdata/sf0.01"

  /** Pin generator: `runMain graft.tools.Golden [sfDir]` prints the
    * committed map entries for QueriesSpec. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(PinSf)
    if (dir != PinSf && dir != PinSf2) System.err.println(
      s"[golden] WARNING: generating pins against $dir, but QueriesSpec " +
        s"binds its committed pins to $PinSf / $PinSf2 — update Golden.PinSf " +
        "and the QueriesSpec header together if the pin corpus is changing")
    val spark = graft.GraftSession.local("graft-golden")
    NoOracle.foreach { name =>
      val (n, h) = checksum(graft.SparkEntry.queries(name)(spark, dir))
      println(s"""    "$name" -> (${n}L, "$h"),""")
    }
    spark.stop()
  }
}
