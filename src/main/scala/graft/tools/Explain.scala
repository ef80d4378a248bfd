// Ad-hoc plan inspection: sbt 'runMain graft.tools.Explain <query> [sfDir]'
//   --audit [sfDir]       histogram per query through the SERVING profile
//                         (Lane + PlanCache — what a small corpus gets)
//   --audit-raw [sfDir]   histogram over the UNWRAPPED constructors
//                         (parent session, AQE on — what a lane-bypassed
//                         100 TB corpus gets); r17 requirement: both
//                         profiles must audit clean
//   --final <q> [sfDir]   drive one query's own physical plan to
//                         completion and histogram + print the FINAL
//                         adaptive plan (AQE runtime conversions applied)
package graft.tools

import graft.{GraftSession, SparkEntry}

object Explain {
  private val DefaultSf = "/root/testdata/sf0.01"

  private def histogram(plan: String): String = {
    def n(op: String) = plan.sliding(op.length).count(_ == op)
    // shuffle exchanges only: exclude Broadcast/ReusedExchange hits
    val shuffles = "(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(plan).size
    f"exch=$shuffles%2d bcast=${n("BroadcastExchange")}%2d " +
      f"smj=${n("SortMergeJoin")}%2d bnlj=${n("BroadcastNestedLoop")}%2d " +
      f"cart=${n("CartesianProduct")}%2d sort=${n("Sort ")}%2d"
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else DefaultSf
    val spark = GraftSession.local("graft-explain")
    val mode = args.headOption.getOrElse("")
    if (mode == "--audit" || mode == "--audit-raw") {
      val qs: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] =
        if (mode == "--audit-raw") SparkEntry.rawQueries else SparkEntry.queries
      qs.keys.toSeq.sorted.foreach { name =>
        val plan = qs(name)(spark, dir).queryExecution.executedPlan.toString
        println(f"$name%-22s ${histogram(plan)}")
      }
    } else if (mode == "--final") {
      val df = SparkEntry.queries(args(1))(spark,
        if (args.length > 2) args(2) else DefaultSf)
      // drive THIS frame's physical plan to completion (a count() or a
      // write would execute a separate wrapper QueryExecution and leave
      // df's own AQE plan initial)
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      val plan = qe.executedPlan.toString
      println(f"FINAL ${args(1)}%-22s ${histogram(plan)}")
      println(plan)
    } else {
      SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
