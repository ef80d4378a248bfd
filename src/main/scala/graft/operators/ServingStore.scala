package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fingerprint-keyed serving-generation ensure — the pattern the
  * model-serving family grew one copy at a time (posting index, IVF/PQ
  * models, classifier weights, funnel stamps, resolved enrichment): a
  * store at `path` is fresh iff the sidecar at `path + "_model"` carries
  * the corpus fingerprint; otherwise `build` rewrites the store and the
  * sidecar is stamped AFTER the write commits, so a crash in between
  * leaves a stale sidecar and the next ensure rebuilds — never a
  * fresh-looking stale store. Callers with extra lifecycle (bucketed
  * catalog registration, appendable generations) keep their own copies;
  * plain parquet stores route here.
  */
private[graft] object ServingStore {

  /** Ensure the store at `path` matches `fp`; `build` must (re)write it.
    * Returns the store as a lazy parquet read. */
  def ensure(spark: SparkSession, what: String, path: String, fp: Long)(
      build: => Unit): DataFrame = {
    val fpPath = path + "_model"
    val storedFp =
      try Some(Similarity.readSidecarRows(spark, fpPath)(0).getLong(0))
      catch {
        case e if scala.util.control.NonFatal(e) =>
          Similarity.warnUnreadableSidecar(what, fpPath, e)
          None
      }
    if (!storedFp.contains(fp)) {
      build
      spark.range(1).select(lit(fp).as("fp"))
        .coalesce(1).write.mode("overwrite").parquet(fpPath)
    }
    spark.read.parquet(path)
  }
}
