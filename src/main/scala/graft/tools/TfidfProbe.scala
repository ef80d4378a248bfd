package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Stage-cost breakdown for the tfidf/vocab family under tuning. */
object TfidfProbe {
  private def time(name: String, iters: Int)(f: => Long): Unit = {
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[tfprobe] $name%-22s med=${times(iters / 2)}%.3f min=${times.head}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-tfprobe")
    val iters = 5
    val d = Tables.documents(spark, dir)
    // warm
    graft.operators.Curation.tfidfTerms(spark, dir).count()

    val words = d.select(
      col("doc_id"),
      explode(graft.operators.TextAnalysis.wsTokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    time("words", iters)(words.count())
    val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    time("tf_agg", iters)(tf.count())
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    time("tf_plus_df", iters)(df.count())
    time("joined", iters)(tf.join(df, Seq("term")).count())
    time("full_window", iters)(graft.operators.Curation.tfidfTerms(spark, dir).count())
    time("vocab_top", iters)(graft.operators.TextAnalysis.vocabTop(spark, dir).count())
    spark.stop()
  }
}
