package graft.tools

import graft.{GraftSession, SparkEntry}

/** Storage-bound probe for the localCheckpoint lineage barriers (r14
  * verdict #5): runs a FULL suite pass at the target SF, then repeats
  * the barrier-bearing queries, reporting pinned RDD block storage
  * after each stage — the eviction story (ContextCleaner unpins blocks
  * when the checkpointed frames are GC'd) measured, not asserted.
  *
  * Run: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/sf1
  *      sbt 'runMain graft.tools.BarrierProbe'
  * Not part of the driver contract.
  */
object BarrierProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = GraftSession.local("graft-barrier-probe")
    val sc = spark.sparkContext
    def report(stage: String): Unit = {
      val infos = sc.getRDDStorageInfo
      val bytes = infos.map(i => i.memSize + i.diskSize).sum
      println(f"[barrier] $stage%-28s blocks=${infos.map(_.numCachedPartitions).sum}%4d " +
        f"rdds=${infos.length}%3d pinned=${bytes / 1024.0 / 1024.0}%8.1f MiB")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable =>
        println(s"[barrier] $n FAILED: ${e.getClass.getName}") }
    }
    report("after full suite pass")
    val barrierQs = Seq("q_corpus_clean", "q_corpus_stats", "q_quality_thresholds",
      "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram")
    (1 to 5).foreach { i =>
      barrierQs.foreach(n => SparkEntry.queries(n)(spark, dir).count())
      report(s"after barrier round $i")
    }
    System.gc(); Thread.sleep(2000)
    report("after gc settle")
    spark.stop()
  }
}
