package graft.tools
import graft._
import org.apache.spark.sql.SparkSession

/** Stage-cost probe for the dedup-resolve family: times candidate-pair
  * generation vs full component resolution for the n-gram and embedding
  * graphs, and prints the star-loop round count (0 = the size-adaptive
  * driver union-find path served the call). Same role as [[TfidfProbe]]
  * for the tfidf/vocab family. */
object ProbeResolve {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("probe").master("local[32]").getOrCreate()
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime()-t0)/1e9}%.3f s (rounds=${operators.Dedup.lastResolveRounds})"); r
    }
    // warm
    operators.Dedup.dedupResolveServe(spark, dir).count()
    for (i <- 1 to 2) {
      time(s"pairs_only_$i")(operators.Dedup.ngramJaccardServe(spark, dir).count())
      time(s"resolve_default_$i")(operators.Dedup.dedupResolveServe(spark, dir).count())
      time(s"emb_pairs_$i")(operators.Similarity.embeddingDedup(spark, dir).count())
      time(s"emb_resolve_$i")(operators.Similarity.embeddingDedupResolve(spark, dir).count())
    }
    spark.stop()
  }
}
