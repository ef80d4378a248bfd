package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

object FusionProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("fusion-probe")
    val dir = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vecs = Tables.embeddings(spark, dir).filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val pairs = vecs.crossJoin(
      vecs.select(col("vec_id").as("vb"), col("embedding").as("eb")))
    def hof = pairs.select(Similarity.cosineHof(
        transform(col("embedding"), x => x.cast("double")),
        transform(col("eb"), x => x.cast("double"))).as("c"))
      .agg(count(when(col("c") > 0.9, 1)))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    println("[probe] optimized contains graft_cosine: " +
      hof.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    time("hof_with_rule") { hof.collect() }
    // disable the rule and compare
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.experimental.extraOptimizations = Seq.empty
    println("[probe] rule removed; contains graft_cosine: " +
      hof.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    time("hof_no_rule") { hof.collect() }
    time("hof_no_rule_2") { hof.collect() }
    spark.stop()
  }
}
