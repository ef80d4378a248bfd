package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Stage-cost probe for the LM scoring stream. */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-lmprobe")
    graft.operators.Curation.lmScore(spark, dir).count() // warm + store
    def time(name: String, iters: Int)(f: => Long): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[lmprobe] $name%-18s med=${ts(iters / 2)}%.3f min=${ts.head}%.3f")
    }
    val d = Tables.documents(spark, dir)
    time("scan_text", 5)(d.select(col("doc_id"), length(col("text"))).count())
    val words = split(regexp_replace(trim(col("text")), "\\s+", " "), " ")
    time("tokenize_regex", 5)(d.select(aggregate(
      transform(words, w => xxhash64(w)), lit(0L), (acc, x) => acc + x)).count())
    val h = d.select(col("doc_id"),
      transform(words, w => xxhash64(w)).as("h")).filter(size(col("h")) >= 2)
    time("bigram_stream", 5)(h.select(col("doc_id"),
      explode(expr("transform(sequence(1, size(h) - 1), " +
        "i -> struct(element_at(h, i) AS a, element_at(h, i + 1) AS b))")).as("bg"))
      .count())
    time("full_serve", 5)(graft.operators.Curation.lmScore(spark, dir).count())
    spark.stop()
  }
}
