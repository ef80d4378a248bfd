package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fingerprint-keyed serving-generation ensure — the pattern the
  * model-serving family grew one copy at a time (posting index, IVF/PQ
  * models, classifier weights, funnel stamps, resolved enrichment): a
  * store under `path` is fresh iff the sidecar at `path + "_model"`
  * carries the corpus fingerprint; otherwise `build` writes a NEW
  * generation and the sidecar is stamped AFTER the write commits, so a
  * crash in between leaves a stale sidecar and the next ensure rebuilds
  * — never a fresh-looking stale store.
  *
  * Each build writes a UNIQUE subdirectory (`path/gen_<fp-hex>_<nonce>`)
  * and the sidecar names it: a rebuild can never overwrite files ANY
  * live reader references — not even when a corpus cycles back to a
  * previously-seen fingerprint (A→B→A would have re-targeted a pure
  * fp-derived directory in place; the r11 review caught it). The
  * sidecar-named previous generation survives exactly one rebuild cycle
  * for readers handed out before the swap; older generations are
  * pruned, bounding the store at two generations of disk. When the
  * sidecar is unreadable the previous generation is UNKNOWN, so pruning
  * is skipped entirely rather than guessed. Pre-generation (flat
  * layout) sidecars carry no generation name and read as unproven —
  * they migrate with one rebuild. Callers with extra lifecycle
  * (bucketed catalog registration, appendable generations) keep their
  * own copies; plain parquet stores route here.
  */
private[graft] object ServingStore {

  /** Unique directory for a NEW generation build: fingerprint for
    * auditability plus a nanotime nonce for uniqueness — never reuses a
    * directory a previous build (even of the same fp) may have handed
    * to a live reader. */
  private[graft] def newGenerationPath(path: String, fp: Long): String =
    path + "/gen_" + java.lang.Long.toHexString(fp) + "_" +
      java.lang.Long.toHexString(System.nanoTime())

  /** (fp, generation dir path) from the sidecar — None when unreadable
    * (warned) or when it predates the generation layout (no warn: that
    * is the documented migration path). */
  private[graft] def readSidecar(spark: SparkSession, what: String,
      path: String): Option[(Long, String)] =
    try {
      val df = spark.read.parquet(path + "_model")
      if (!df.columns.contains("gen")) None
      else {
        val r = df.select(col("fp"), col("gen")).collect()(0)
        Some((r.getLong(0), path + "/" + r.getString(1)))
      }
    } catch {
      // missing-vs-unreadable is distinguished INSIDE
      // warnUnreadableSidecar (a sidecar that does not exist yet is the
      // normal first build and logs nothing; only a present-but-broken
      // one warns) — keep that distinction in one place
      case e if scala.util.control.NonFatal(e) =>
        Similarity.warnUnreadableSidecar(what, path + "_model", e)
        None
    }

  private[graft] def writeSidecar(spark: SparkSession, path: String, fp: Long,
      gen: String): Unit =
    spark.range(1)
      .select(lit(fp).as("fp"),
        lit(java.nio.file.Paths.get(gen).getFileName.toString).as("gen"))
      .coalesce(1).write.mode("overwrite").parquet(path + "_model")

  /** The current sidecar-named generation directory, if fresh for `fp`. */
  private[graft] def currentGeneration(spark: SparkSession, what: String,
      path: String, fp: Long): Option[String] =
    readSidecar(spark, what, path).collect {
      case (f, g) if f == fp &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(g)) => g
    }

  /** Ensure a generation of the store under `path` matching `fp`;
    * `build` must write the store to the directory it is handed.
    * Returns the fresh generation as a lazy parquet read. */
  def ensure(spark: SparkSession, what: String, path: String, fp: Long)(
      build: String => Unit): DataFrame = {
    val stored = readSidecar(spark, what, path)
    val fresh = stored.collect {
      case (f, g) if f == fp &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(g)) => g
    }
    fresh match {
      case Some(gen) => spark.read.parquet(gen)
      case None =>
        val target = newGenerationPath(path, fp)
        build(target)
        writeSidecar(spark, path, fp, target)
        // prune everything but the new generation and the sidecar-named
        // previous one (live readers hold it for one rebuild cycle). An
        // unreadable sidecar means the live generation is UNKNOWN —
        // skip pruning rather than delete what a reader may hold.
        stored.foreach { case (_, prevGen) =>
          prune(path, keep = Set(target, prevGen))
        }
        spark.read.parquet(target)
    }
  }

  /** Delete everything under `path` except the directories in `keep`:
    * generations two or more rebuilds old (no plan handed out before the
    * previous rebuild can still be live across a later one without
    * having been re-ensured) and legacy flat-layout files. Local-fs
    * walk — the serving warehouse is node-local by design. Streams are
    * closed eagerly (each Files.list/walk holds a directory fd). */
  private[graft] def prune(path: String, keep: Set[String]): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root)) return
    val keepNames = keep.map(p => java.nio.file.Paths.get(p).getFileName.toString)
    import scala.jdk.CollectionConverters._
    val children = {
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.toList finally s.close()
    }
    children
      .filterNot(p => keepNames.contains(p.getFileName.toString))
      .foreach { p =>
        val toDelete = {
          val s = java.nio.file.Files.walk(p)
          try s.iterator().asScala.toList finally s.close()
        }
        toDelete.reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
      }
  }
}
