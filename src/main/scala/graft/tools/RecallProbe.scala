package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Prints the ANN ladder's mean recall@10 on a corpus dir — the
  * measurement harness for index-quality changes (e.g. residual vs raw
  * PQ encoding): run before and after, compare the printed numbers. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-recall-probe")
    def mean(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val m = df.select(col("query_id"), col("recall_at_k")).distinct()
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
      println(f"RECALL $name%-8s $m%.4f")
    }
    mean("lsh", Similarity.knnLsh(spark, dir))
    mean("ivf", Similarity.knnIvfServe(spark, dir))
    mean("pq", Similarity.knnPqServe(spark, dir))
    mean("ivfpq", Similarity.knnIvfPqServe(spark, dir))
    spark.stop()
  }
}
