// Ad-hoc plan inspection: sbt 'runMain graft.tools.Explain <query> [sfDir]'
package graft.tools

import graft.{GraftSession, SparkEntry}

object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-explain")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
