package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._
import org.apache.spark.sql.functions._

/** Ad-hoc 10x scale stress: replicates the sf0.1 corpus (shifted ids, so
  * each doc gains a 10-clique of exact dups — an adversarial dedup load)
  * and times the heavy operators. Not part of the driver contract; used
  * to validate that candidate generation stays bounded.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.Stress'
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-stress")
    val docs0 = Tables.documents(spark, dir)
    val n = docs0.count()
    val docs10 = (0 until 10)
      .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _)
      .localCheckpoint()
    println(s"[stress] corpus: ${docs10.count()} docs (${n} x 10, 10-cliques of exact dups)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs  $rows%9d rows")
    }
    time("ngram_jaccard") { Dedup.ngramJaccard(docs10).count() }
    time("minhash") { Dedup.minhashDedup(docs10).count() }
    time("simhash") { Dedup.simhashDedup(docs10).count() }
    // per-row signature kernels vs the exploded-aggregate formulations
    time("simhash_sig_kernel") { Dedup.simhashSignatures(docs10).count() }
    time("simhash_sig_agg") { Dedup.simhashSignaturesAgg(docs10).count() }
    time("minhash_sig_kernel") { Dedup.minhashSignatures(docs10).count() }
    time("minhash_sig_agg") { Dedup.minhashSignaturesAgg(docs10).count() }
    time("resolve") {
      Dedup.resolveComponents(Dedup.ngramJaccard(docs10).select("doc_a", "doc_b")).count()
    }

    // native fused cosine vs composed higher-order functions (all-pairs
    // over a 1000-vector slice = 1M kernel evaluations)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vecs = Tables.embeddings(spark, dir).filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val pairs = vecs.crossJoin(
      vecs.select(col("vec_id").as("vb"), col("embedding").as("eb")))
    time("cosine_native") {
      pairs.select(graft.functions.GraftFunctions
        .graftCosine(col("embedding"), col("eb")).as("c"))
        .agg(count(when(col("c") > 0.9, 1))).collect()(0).getLong(0)
    }
    time("cosine_hof") {
      pairs.select(Similarity.cosineHof(
        transform(col("embedding"), x => x.cast("double")),
        transform(col("eb"), x => x.cast("double"))).as("c"))
        .agg(count(when(col("c") > 0.9, 1))).collect()(0).getLong(0)
    }

    // r6 curation operators over the same replicated corpus: repetition
    // is the scan-rate baseline (zero shuffles); contamination's eval
    // side stays ~original-corpus-sized while the train side scales;
    // rarity's vocab (df) side does not grow with replication at all;
    // the classifier trains on 10x rows with the same 8-aggregate
    // schedule. Each should scale ~linearly in the replicated rows.
    time("repetition_stats") { Curation.repetitionStatsOf(docs10).count() }
    time("contamination") { Curation.contaminationOf(docs10).count() }
    time("rarity_score") { Curation.rarityScoreOf(docs10).count() }
    time("sample_stratified") { Curation.sampleStratifiedOf(docs10).count() }
    time("quality_lr_fit") {
      QualityModel.fitQualityLr(QualityModel.featureFrame(docs10)).length.toLong
    }

    // r9 operators. dup_spans is the adversarial case here: 10-cliques
    // make EVERY positional gram shared (nd = 10), so the shared-gram
    // attach join sees the full gram table — the worst case for the
    // "shared grams are the small side" broadcast argument, which is
    // why it must stay bounded. lm_score's count tables stay
    // vocabulary-sized under replication. export_manifest is the
    // scan-rate baseline (one kernel scan + 32-group aggregate).
    time("dup_spans") { Dedup.dupSpans(docs10).count() }
    time("lm_score") { Curation.lmScoreOf(docs10).count() }
    time("export_manifest") { Export.manifestOf(docs10).count() }
    // cluster-blocked embedding dedup at 10x: replicate vectors with
    // shifted ids (10-cliques of exact-duplicate vectors — every clique
    // lands in one cell) and verify in-cell pairwise stays bounded by
    // the cap while the planted cliques all pair.
    val emb10 = (0 until 10)
      .map(i => Tables.embeddings(spark, dir)
        .select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          col("embedding").as("vec")))
      .reduce(_ unionAll _)
      .localCheckpoint()
    val cents = Similarity.ivfFit(emb10, nList = math.max(16, (emb10.count() / 24).toInt))
    time("embed_cells_dedup") {
      Similarity.embeddingDedupCellsOf(emb10, cents, threshold = 0.999).count()
    }
    spark.stop()
  }
}
