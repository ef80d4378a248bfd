package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.builder("graft-verify")
      .master(s"local[${GraftSession.cpus}]")
      .getOrCreate()
    GraftSession.tuneLogs(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // BRANCH-SCOPED oracles (r18): the embedding-dedup oracles replay
    // the LSH-banded branch, which is what the registered query RUNS at
    // or under LshSaturationBound vectors; past the bound the query
    // switches to k-means cells blocking, whose trained centroids a
    // standalone SQL cannot reproduce — the dump omits the two entries
    // there (the gate then records the rows-only check, exactly the
    // pre-oracle state), instead of failing on an inapplicable oracle.
    // The branch probe must FAIL LOUDLY on a read error over an existing
    // table (r18 advice): swallowing it into `false` would silently
    // include the branch-scoped oracles on a past-bound corpus and fail
    // the gate on an inapplicable oracle. Only a genuinely absent
    // embeddings table defaults to the LSH branch (trivially under
    // bound: no vectors at all).
    val embPath = s"$sfDir/embeddings.parquet"
    val pastLshBound =
      new java.io.File(embPath).exists() &&
        spark.read.parquet(embPath).count() >
          graft.operators.Similarity.LshSaturationBound
    val oracles =
      if (pastLshBound)
        SparkEntry.oracleSql -- Seq("q_dedup_embedding", "q_dedup_embedding_resolve")
      else SparkEntry.oracleSql
    // Checker oracles read the engine's own dump back: resolve their
    // path token to THIS run's absolute result directory.
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = oracles
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.operators.Similarity.GraftOutToken, outAbs))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
