package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._
import org.apache.spark.sql.functions._

/** 100x stress tier, second wave (r13): the surfaces the first wave
  * ([[StressR13]]) predates — the embedding-dedup serving stores, the
  * lazily-engaged band-bucket valve, the ANN serve, and the media-hash
  * delta append.
  *
  * Replication plants k-cliques of EXACT duplicate vectors (same
  * embedding under k ids): every copy shares all 8 LSH band buckets,
  * so bucket sizes grow k-fold — at 100x they cross
  * [[Dedup.BandBucketCap]] and the valve must flip from the
  * zero-overhead uncapped plan to the survival-mask plan, drop the
  * degenerate buckets observably, and BOUND the pair output instead of
  * emitting ~5k pairs per original vector.
  *
  * The media append row measures the incremental-ingest claim
  * directly: appending a 1-replica delta into a 9-replica store must
  * cost a fraction of the 10-replica full rebuild it replaces.
  *
  * Not part of the driver contract.
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.StressR13b'
  */
object StressR13b {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-stress-r13b")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      results(name) = secs
      val rows = out match { case n: Long => f"$n%9d rows"; case _ => "" }
      println(f"[stress13b] $name%-30s $secs%8.2fs  $rows")
      out
    }

    def exponent(name10: String, name100: String): Unit =
      (results.get(name10), results.get(name100)) match {
        case (Some(a), Some(b)) if a > 0 =>
          println(f"[stress13b] exponent ${name100.stripSuffix("_100x")}%-21s " +
            f"${math.log(b / a) / math.log(10)}%5.2f  (t100/t10 = ${b / a}%5.1f)")
        case _ => ()
      }

    // ---- replicated embeddings (k-cliques of exact-duplicate vectors)
    val emb0 = Tables.embeddings(spark, dir)
    def replicateEmb(k: Int): String = {
      val tmp = java.nio.file.Files.createTempDirectory(s"stress13bemb$k").toString
      (0 until k)
        .map(i => emb0.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(tmp + "/embeddings.parquet")
      tmp
    }
    val e10 = time("emb_write_10x") { val t = replicateEmb(10); spark.read.parquet(t + "/embeddings.parquet").count(); t }
    val e100 = time("emb_write_100x") { val t = replicateEmb(100); spark.read.parquet(t + "/embeddings.parquet").count(); t }

    // signature-store build: one projection scan + parquet write
    time("emb_sig_build_10x") { Similarity.serveEmbSigs(spark, e10).count() }
    time("emb_sig_build_100x") { Similarity.serveEmbSigs(spark, e100).count() }
    exponent("emb_sig_build_10x", "emb_sig_build_100x")

    // dedup serve: the LSH band space is FIXED at 16 buckets/band, so
    // at 10x (20k vectors, ~1250/bucket) EVERY bucket crosses
    // BandBucketCap — r13 served 0 pairs here. r14 makes the registered
    // query size-adaptive: past LshSaturationBound (8k vectors) it
    // delegates to the corpus-adaptive cells blocking, so the planted
    // duplicate cliques MUST now be found at both stress tiers
    val d10 = time("emb_dedup_serve_10x") { Similarity.embeddingDedup(spark, e10).count() }
    require(d10 > 0, s"size-adaptive embeddingDedup served $d10 pairs at 10x — " +
      "the strategy switch did not engage")
    val d100 = time("emb_dedup_serve_100x") { Similarity.embeddingDedup(spark, e100).count() }
    require(d100 > 0, s"size-adaptive embeddingDedup served $d100 pairs at 100x")

    // cluster-blocked variant: assignment-store build then serve; hot
    // CELLS cap independently (SemCellCap) — same shape expectations
    time("emb_assign_build_10x") { Similarity.serveCellAssignments(spark, e10).count() }
    time("emb_assign_build_100x") { Similarity.serveCellAssignments(spark, e100).count() }
    exponent("emb_assign_build_10x", "emb_assign_build_100x")
    time("emb_cells_serve_10x") { Similarity.embeddingDedupCells(spark, e10).count() }
    time("emb_cells_serve_100x") { Similarity.embeddingDedupCells(spark, e100).count() }

    // ANN serve on the replicated corpora: the first call pays index
    // ensure (train + code + write), the second is the steady-state
    // probe-pruned search — the serving surface, not the per-call
    // retrain form
    time("knn_ivf_ensure_10x") { Similarity.knnIvfServe(spark, e10).count() }
    time("knn_ivf_serve_10x") { Similarity.knnIvfServe(spark, e10).count() }
    time("knn_ivf_ensure_100x") { Similarity.knnIvfServe(spark, e100).count() }
    time("knn_ivf_serve_100x") { Similarity.knnIvfServe(spark, e100).count() }
    exponent("knn_ivf_serve_10x", "knn_ivf_serve_100x")

    // ---- media-hash delta append vs full rebuild (the incremental claim)
    val docs0 = Tables.documents(spark, dir)
    def writeDocs(path: String, k: Int): Unit =
      (0 until k)
        .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(path + "/documents.parquet")
    val m9 = java.nio.file.Files.createTempDirectory("stress13bmedia").toString
    writeDocs(m9, 9)
    time("media_hash_build_9rep") { Multimodal.ensureMediaHashes(spark, m9).count() }
    val preFp = Multimodal.mediaHashesFingerprint(spark, m9)
    val delta = docs0.withColumn("doc_id", col("doc_id") + lit(9L * 10000000L))
    delta.write.mode("append").parquet(m9 + "/documents.parquet")
    time("media_hash_append_1rep") {
      Multimodal.appendMediaHashes(spark, m9, delta, preFp)
      Multimodal.ensureMediaHashes(spark, m9).count()
    }
    val m10 = java.nio.file.Files.createTempDirectory("stress13bmedia10").toString
    writeDocs(m10, 10)
    time("media_hash_rebuild_10rep") { Multimodal.ensureMediaHashes(spark, m10).count() }
    // what the append actually saves is the DECODE share — with real
    // codecs it dwarfs everything; the synthetic transcode is so cheap
    // that at this scale the merge-write + fingerprint overhead can win.
    // Measure the decode share directly so the reading is honest:
    time("media_decode_only_10rep") {
      Multimodal.hashRows(spark, Multimodal.corpus(spark, m10)).toDF().count()
    }
    time("media_decode_only_delta") {
      Multimodal.hashRows(spark,
        Multimodal.transcode(spark,
          Multimodal.plantIngestDups(Multimodal.fromDocuments(delta))).toDF())
        .toDF().count()
    }
    for {
      a <- results.get("media_hash_append_1rep")
      r <- results.get("media_hash_rebuild_10rep")
      df <- results.get("media_decode_only_10rep")
      dd <- results.get("media_decode_only_delta")
    } println(f"[stress13b] append/rebuild ${a / r}%5.2f total; " +
      f"decode share delta/full ${dd / df}%5.2f (the part the append skips)")

    println("[stress13b] done")
    spark.stop()
  }
}
