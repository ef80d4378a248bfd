// Ad-hoc plan inspection: sbt 'runMain graft.tools.Explain <query> [sfDir]'
package graft.tools

import graft.{GraftSession, SparkEntry}

object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-explain")
    if (args.headOption.contains("--audit")) {
      // summarize every query's physical plan: operator histogram
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        def n(op: String) = plan.sliding(op.length).count(_ == op)
        // shuffle exchanges only: exclude Broadcast/ReusedExchange hits
        val shuffles = "(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(plan).size
        println(f"$name%-22s exch=$shuffles%2d bcast=${n("BroadcastExchange")}%2d " +
          f"smj=${n("SortMergeJoin")}%2d bnlj=${n("BroadcastNestedLoop")}%2d " +
          f"cart=${n("CartesianProduct")}%2d sort=${n("Sort ")}%2d")
      }
    } else {
      SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
