package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search: brute-force cosine top-k (the correctness
  * baseline) and random-hyperplane LSH variants (the scale path), plus
  * embedding-cosine near-dup pairing.
  *
  * Scale design: the query side is broadcast, so brute-force top-k is a
  * map-side pass over the corpus with per-partition ranking — the corpus
  * is never shuffled and never collected. The LSH variant buckets the
  * corpus by hyperplane-sign bands so each probe touches only matching
  * buckets (candidates ∝ rows/2^r per band); recall/cost is tuned by
  * (bands, rows-per-band). Vector math uses codegen'd higher-order array
  * functions with deterministic left-to-right fold order.
  */
object Similarity {

  /** Cosine similarity via composed higher-order functions — the
    * reference formulation the native expression is benchmarked against
    * (kept for specs; production paths use
    * [[graft.functions.CosineSimilarity]]). */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Fused single-pass codegen cosine (see CosineSimilarity.scala). */
  def cosine(a: Column, b: Column): Column = GraftFunctions.graftCosine(a, b)

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("vec"))
  }

  /** q_knn_brute — exact cosine top-k for a query subset (vec_id < 8)
    * against the whole corpus. */
  def knnBrute(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val corpus = emb(spark, dir)
    val queries = broadcast(
      corpus.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("vec").as("qvec")))
    val scored = corpus
      .join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("vec")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rk"))
  }

  // ------------------------------------------------------- LSH hyperplanes

  val LshBands = 8
  val PlanesPerBand = 4
  val Dim = 64

  /** Deterministic hyperplanes (seeded library constants). */
  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(11)
    Array.fill(LshBands * PlanesPerBand)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  private def planeLit(p: Array[Double]): Column = array(p.map(lit(_)): _*)

  /** Sign-bit bucket id of `v` for band `b`: PlanesPerBand bits (fused
    * dot kernel — 32 plane projections per vector). */
  private def bandBucket(v: Column, b: Int): Column =
    (0 until PlanesPerBand)
      .map { r =>
        val p = planeLit(planes(b * PlanesPerBand + r))
        when(GraftFunctions.graftDot(v, p) > 0, lit(1 << r)).otherwise(lit(0))
      }
      .reduce(_ + _)

  private def banded(df: DataFrame, vecCol: String, idAs: String): DataFrame = {
    val bands = (0 until LshBands).map(b =>
      struct(lit(b).as("band"), bandBucket(col(vecCol), b).as("bucket")))
    df.select(col("vec_id").as(idAs), col(vecCol),
      explode(array(bands: _*)).as("bb"))
      .select(col(idAs), col(vecCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Primary bucket plus the multi-probe alternate (flip the sign bit
    * with the smallest projection margin — the bit most likely to differ
    * for a true near neighbor). Doubles recall per band without adding
    * bands or touching the corpus-side index. */
  private def bandProbePair(v: Column, b: Int): Seq[Column] = {
    val ds = (0 until PlanesPerBand)
      .map(r => GraftFunctions.graftDot(v, planeLit(planes(b * PlanesPerBand + r))))
    val bucket = ds.zipWithIndex
      .map { case (d, r) => when(d > 0, lit(1 << r)).otherwise(lit(0)) }
      .reduce(_ + _)
    val absA = array(ds.map(abs): _*)
    val weakest = (array_position(absA, array_min(absA)) - 1).cast(IntegerType)
    val mask = (0 until PlanesPerBand)
      .map(r => when(weakest === r, lit(1 << r)).otherwise(lit(0)))
      .reduce(_ + _)
    Seq(bucket, bucket.bitwiseXOR(mask))
  }

  /** q_knn_lsh — approximate top-k: candidates are corpus vectors sharing
    * any LSH band bucket with the query (multi-probe on the query side);
    * ranked by true cosine. */
  def knnLsh(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val corpus = emb(spark, dir)
    val corpusBands = banded(corpus, "vec", "vec_id").select("vec_id", "band", "bucket")
    val probeStructs = (0 until LshBands).flatMap { b =>
      bandProbePair(col("qvec"), b).map(p =>
        struct(lit(b).as("band"), p.as("bucket")))
    }
    val queryBands = corpus
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
      .select(col("query_id"), explode(array(probeStructs: _*)).as("bb"))
      .select(col("query_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // candidate pairs deduped as BARE IDS (8-byte keys through the
    // shuffle); vectors re-attached afterwards from the corpus
    val candidates = corpusBands
      .join(broadcast(queryBands), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    candidates
      .join(broadcast(corpus.select(col("vec_id").as("query_id"), col("vec").as("qvec"))),
        Seq("query_id"))
      .join(corpus, Seq("vec_id"))
      .withColumn("cosine", cosine(col("qvec"), col("vec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rk"))
  }

  // ------------------------------------------------------------------ IVF

  val IvfNList = 16
  val IvfNProbe = 4
  val IvfIters = 3

  /** Squared L2 distance between a vector column and a literal centroid
    * (fused codegen kernel — the IVF assign pass evaluates this NList
    * times per row). */
  private def l2sq(v: Column, centroid: Array[Double]): Column =
    GraftFunctions.graftL2sq(v, array(centroid.map(lit(_)): _*))

  /** Train an IVF coarse quantizer with Lloyd iterations. Centroids are
    * MODEL STATE (NList x dim doubles) — collecting them to the driver
    * each round is legitimate and O(KB); the assignment and update passes
    * stay fully distributed. Init is deterministic (first NList vectors by
    * id), updates are means, ties in assignment break to the lowest
    * centroid index. */
  def ivfFit(corpus: DataFrame, nList: Int = IvfNList, iters: Int = IvfIters): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = corpus
      .orderBy(col("vec_id")).limit(nList)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 0 until iters) {
      val dists = array(centroids.map(c => l2sq(col("vec"), c)): _*)
      val assigned = corpus.withColumn(
        "cid", array_position(dists, array_min(dists)).cast(IntegerType) - 1)
      // decimal-exact component means: avg() over raw floats would be
      // partition-order-dependent and make trained centroids (and thus
      // search results) vary across runs/retries
      val dims = assigned
        .select(col("cid"), posexplode(col("vec")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(28, 9))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("m"))
        .collect()
      val next = Array.fill(centroids.length)(new Array[Double](centroids(0).length))
      val seen = Array.fill(centroids.length)(false)
      dims.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2); seen(r.getInt(0)) = true
      }
      centroids = centroids.indices.map(i => if (seen(i)) next(i) else centroids(i)).toArray
    }
    centroids
  }

  /** q_knn_ivf — IVF search: corpus sharded into NList inverted lists by
    * the trained quantizer; each query probes its NProbe nearest lists and
    * ranks only those candidates by true cosine. At corpus scale the
    * inverted lists are the partitioning (write-time `partitionBy(cid)`),
    * so a probe touches NProbe/NList of the data. */
  def knnIvf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val corpus = emb(spark, dir)
    val centroids = ivfFit(corpus)
    val dists = array(centroids.map(c => l2sq(col("vec"), c)): _*)
    val listed = corpus.withColumn(
      "cid", array_position(dists, array_min(dists)).cast(IntegerType) - 1)
    val probeIdx = {
      // indices of the NProbe smallest distances: sort (dist, idx) structs
      val pairs = array(centroids.zipWithIndex.map { case (c, i) =>
        struct(l2sq(col("qvec"), c).as("d"), lit(i).as("i"))
      }: _*)
      transform(slice(array_sort(pairs), 1, IvfNProbe), p => p.getField("i"))
    }
    val queries = corpus
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
      .withColumn("probe_cid", explode(probeIdx))
    val candidates = listed
      .join(broadcast(queries), col("cid") === col("probe_cid"))
      .filter(col("vec_id") =!= col("query_id"))
    candidates
      .withColumn("cosine", cosine(col("qvec"), col("vec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rk"))
  }

  /** q_dedup_embedding — embedding-cosine near-dup pairs via LSH-banded
    * candidate generation (threshold tuned to the harness corpus, which
    * has no planted >0.9 pairs — see SURVEY §2B). */
  def embeddingDedup(spark: SparkSession, dir: String, threshold: Double = 0.45): DataFrame = {
    val corpus = emb(spark, dir)
    val bands = banded(corpus, "vec", "vec_id").select("vec_id", "band", "bucket")
    val candidates = bands
      .join(bands.select(col("vec_id").as("vec_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("vec_id") < col("vec_b"))
      .select(col("vec_id").as("vec_a"), col("vec_b"))
      .distinct()
    candidates
      .join(corpus.select(col("vec_id").as("vec_a"), col("vec").as("va")), Seq("vec_a"))
      .join(corpus.select(col("vec_id").as("vec_b"), col("vec").as("vb")), Seq("vec_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }
}
