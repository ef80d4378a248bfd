package graft.tools
import graft.{GraftSession, Tables}
import graft.operators._
object IdfProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-idfprobe")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[idf] $n%-14s ${(System.nanoTime() - t0) / 1e9}%6.2fs  $r rows")
    }
    // warm both once
    Dedup.simhashIdfDedup(spark, dir).count()
    Dedup.simhashIdfDedup(Tables.documents(spark, dir)).count()
    (1 to 4).foreach { i =>
      time(s"inline_$i") { Dedup.simhashIdfDedup(Tables.documents(spark, dir)).count() }
      time(s"served_$i") { Dedup.simhashIdfDedup(spark, dir).count() }
    }
    spark.stop()
  }
}
