package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._
import org.apache.spark.sql.functions._

/** 100x stress tier (r12 verdict #8): the same adversarial replication
  * discipline as [[Stress]]/[[StressR11]], but each path measured at
  * BOTH 10x and 100x in one session so the OBSERVED scaling exponent
  * `log(t100/t10) / log(10)` is a same-window number (1.0 = linear;
  * the replicated corpus grows 10x between the rows).
  *
  * Paths (the four builds the 100 TB story leans on):
  *  - banding dedup candidate generation (minhash + simhash) over
  *    replicated documents — replication plants k-cliques of exact
  *    dups, the candidate explosion worst case the band caps bound;
  *  - posting-index build (shingle scan + bucketed write) — the paid-
  *    once-per-generation shuffle;
  *  - forecast day-state build over replicated lineitem with ONE brand
  *    owning half of all rows (StressR11's skew worst case, scaled);
  *  - media hash build (transcode + decode + 4 hash families in one
  *    pass) + the video dedup serve on top, where 100-cliques exceed
  *    FrameHashCap and must DROP as boilerplate hubs instead of
  *    exploding candidate pairs quadratically.
  *
  * Not part of the driver contract.
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.StressR13'
  */
object StressR13 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-stress-r13")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      results(name) = secs
      val rows = out match { case n: Long => f"$n%9d rows"; case _ => "" }
      println(f"[stress13] $name%-28s $secs%8.2fs  $rows")
      out
    }

    def exponent(name10: String, name100: String): Unit =
      (results.get(name10), results.get(name100)) match {
        case (Some(a), Some(b)) if a > 0 =>
          println(f"[stress13] exponent ${name100.stripSuffix("_100x")}%-19s " +
            f"${math.log(b / a) / math.log(10)}%5.2f  (t100/t10 = ${b / a}%5.1f)")
        case _ => ()
      }

    // ---- replicated documents corpora (k-cliques of exact dups)
    val docs0 = Tables.documents(spark, dir)
    def replicateDocs(k: Int): String = {
      val tmp = java.nio.file.Files.createTempDirectory(s"stress13docs$k").toString
      (0 until k)
        .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(tmp + "/documents.parquet")
      tmp
    }
    val d10 = time("docs_write_10x") { val t = replicateDocs(10); spark.read.parquet(t + "/documents.parquet").count(); t }
    val d100 = time("docs_write_100x") { val t = replicateDocs(100); spark.read.parquet(t + "/documents.parquet").count(); t }
    val docs10 = Tables.documents(spark, d10)
    val docs100 = Tables.documents(spark, d100)

    // banding dedup candidate generation: caps must bound the clique
    // explosion (pairs grow ~k^2 per clique UNTIL a band bucket crosses
    // its cap and drops — the numbers below show the cap engaging)
    time("minhash_banding_10x") { Dedup.minhashDedup(docs10).count() }
    time("minhash_banding_100x") { Dedup.minhashDedup(docs100).count() }
    exponent("minhash_banding_10x", "minhash_banding_100x")
    time("simhash_banding_10x") { Dedup.simhashDedup(docs10).count() }
    time("simhash_banding_100x") { Dedup.simhashDedup(docs100).count() }
    exponent("simhash_banding_10x", "simhash_banding_100x")

    // posting-index build: one shingle scan + one bucketed shuffle
    time("posting_build_10x") {
      Dedup.ensurePostings(spark, d10); spark.table(Dedup.postingsTableName(d10)).count()
    }
    time("posting_build_100x") {
      Dedup.ensurePostings(spark, d100); spark.table(Dedup.postingsTableName(d100)).count()
    }
    exponent("posting_build_10x", "posting_build_100x")

    // ---- media hash build (transcode + decode once, 4 hash families)
    time("media_hash_build_10x") { Multimodal.ensureMediaHashes(spark, d10).count() }
    time("media_hash_build_100x") { Multimodal.ensureMediaHashes(spark, d100).count() }
    exponent("media_hash_build_10x", "media_hash_build_100x")
    // serve on top: 100-cliques exceed FrameHashCap (64) so clique
    // frame hashes DROP as hubs — pairs must shrink, not explode
    time("video_dedup_serve_10x") { Multimodal.videoDedupServe(spark, d10).count() }
    time("video_dedup_serve_100x") { Multimodal.videoDedupServe(spark, d100).count() }
    time("image_dedup_serve_10x") { Multimodal.imageDedupServe(spark, d10).count() }
    time("image_dedup_serve_100x") { Multimodal.imageDedupServe(spark, d100).count() }

    // ---- forecast day-state build, hot-brand skew (StressR11 scaled)
    val li0 = Tables.lineitem(spark, dir)
    val hotKey = Tables.part(spark, dir).select(min(col("p_partkey"))).collect()(0).getLong(0)
    def replicateFact(k: Int): String = {
      val tmp = java.nio.file.Files.createTempDirectory(s"stress13day$k").toString
      (0 until k).map { i =>
        val shifted = li0.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
        // half the replicas collapse onto one brand: the group-skew worst case
        if (i >= k / 2) shifted.withColumn("l_partkey", lit(hotKey)) else shifted
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(tmp + "/lineitem.parquet")
      Tables.part(spark, dir).write.mode("overwrite").parquet(tmp + "/part.parquet")
      tmp
    }
    val f10 = time("fact_write_10x") { val t = replicateFact(10); spark.read.parquet(t + "/lineitem.parquet").count(); t }
    val f100 = time("fact_write_100x") { val t = replicateFact(100); spark.read.parquet(t + "/lineitem.parquet").count(); t }
    time("day_state_build_10x") { Forecast.forecastLinear(spark, f10).count() }
    time("day_state_build_100x") { Forecast.forecastLinear(spark, f100).count() }
    exponent("day_state_build_10x", "day_state_build_100x")

    println("[stress13] done")
    spark.stop()
  }
}
