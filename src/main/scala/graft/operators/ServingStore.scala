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
  * Each generation lives in its own fingerprint-suffixed SUBDIRECTORY
  * (`path/gen_<fp-hex>`), and a rebuild writes a fresh subdirectory
  * instead of overwriting in place (r10 ADVICE: an in-place overwrite
  * could FileNotFound a DataFrame handed out by an earlier ensure, or
  * let a concurrent mid-serve reader see a mixed generation). The
  * immediately-previous generation survives one rebuild cycle for
  * exactly those live readers; older generations are pruned, bounding
  * the store at two generations of disk. Callers with extra lifecycle
  * (bucketed catalog registration, appendable generations) keep their
  * own copies; plain parquet stores route here.
  */
private[graft] object ServingStore {

  /** The generation directory a fingerprint maps to. */
  private[graft] def generationPath(path: String, fp: Long): String =
    path + "/gen_" + java.lang.Long.toHexString(fp)

  /** Ensure a generation of the store under `path` matching `fp`;
    * `build` must write the store to the directory it is handed.
    * Returns the fresh generation as a lazy parquet read. */
  def ensure(spark: SparkSession, what: String, path: String, fp: Long)(
      build: String => Unit): DataFrame = {
    val fpPath = path + "_model"
    val target = generationPath(path, fp)
    val storedFp =
      try Some(Similarity.readSidecarRows(spark, fpPath)(0).getLong(0))
      catch {
        case e if scala.util.control.NonFatal(e) =>
          Similarity.warnUnreadableSidecar(what, fpPath, e)
          None
      }
    // fresh requires BOTH the sidecar match and the generation directory
    // (a legacy flat-layout store has a matching sidecar but no gen dir —
    // it migrates with one rebuild)
    val fresh = storedFp.contains(fp) &&
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(target))
    if (!fresh) {
      build(target)
      spark.range(1).select(lit(fp).as("fp"))
        .coalesce(1).write.mode("overwrite").parquet(fpPath)
      prune(path, keep = Set(target) ++ storedFp.map(generationPath(path, _)))
    }
    spark.read.parquet(target)
  }

  /** Delete everything under `path` except the directories in `keep`:
    * generations two or more rebuilds old (no plan handed out before the
    * previous rebuild can still be live across a later one without
    * having been re-ensured) and legacy flat-layout files. Local-fs
    * walk — the serving warehouse is node-local by design. */
  private[operators] def prune(path: String, keep: Set[String]): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root)) return
    val keepNames = keep.map(p => java.nio.file.Paths.get(p).getFileName.toString)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(root).iterator().asScala.toSeq
      .filterNot(p => keepNames.contains(p.getFileName.toString))
      .foreach { p =>
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
  }
}
