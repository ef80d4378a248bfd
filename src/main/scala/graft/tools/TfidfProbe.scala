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
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val iters = 5
    val d = Tables.documents(spark, dir)
    // warm
    graft.operators.Curation.tfidfTerms(spark, dir).count()

    val tfK = d.select(
      col("doc_id"),
      explode(call_function(
        graft.functions.GraftFunctions.WordCountsName, col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
    time("tf_kernel", iters)(tfK.count())
    val tfC = tfK.localCheckpoint(eager = false)
    time("tf_checkpointed", iters)(tfC.count())
    val df = tfC.groupBy(col("term")).agg(count(lit(1)).as("df"))
    time("tf_plus_df", iters)(df.count())
    time("joined", iters)(tfC.join(df, Seq("term")).count())
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val scored = tfC.join(df, Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf").cast("double") * col("n_docs").cast("double")) / col("df").cast("double"))
    time("scored", iters)(scored.count())
    time("full", iters)(graft.operators.Curation.tfidfTerms(spark, dir).count())
    spark.stop()
  }
}
