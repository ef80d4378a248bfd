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
    // Existence probes via Hadoop FileSystem, not java.io.File (r19
    // ADVICE): a non-local sfDir (hdfs/s3) would make File.exists()
    // return false and silently select the LSH branch on a past-bound
    // corpus — the exact inapplicable-oracle failure the probe avoids.
    def hadoopExists(p: String): Boolean = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    }
    val embPath = s"$sfDir/embeddings.parquet"
    val pastLshBound =
      hadoopExists(embPath) &&
        spark.read.parquet(embPath).count() >
          graft.operators.Similarity.LshSaturationBound
    val oracles0 =
      if (pastLshBound)
        SparkEntry.oracleSql -- Seq("q_dedup_embedding", "q_dedup_embedding_resolve")
      else SparkEntry.oracleSql
    // The BPE checker oracle needs the trained merge table substituted
    // in as VALUES rows (deterministic training — identical to the
    // table the query itself trains). A corpus that trains ZERO merges
    // cannot render a VALUES list; the entry drops to the pre-checker
    // rows-only state instead of emitting invalid SQL.
    val bpeMerges =
      if (oracles0.contains("q_text_bpe") && hadoopExists(s"$sfDir/documents.parquet"))
        graft.operators.TextAnalysis.bpeModelMerges(spark, sfDir)
      else Array.empty[String]
    val bpeValues = bpeMerges.zipWithIndex
      .map { case (m, i) => s"($i, '${m.replace("'", "''")}')" }.mkString(", ")
    val oracles =
      if (bpeMerges.nonEmpty) oracles0 else oracles0 - "q_text_bpe"
    // Checker oracles read the engine's own dump back: resolve their
    // path token to THIS run's absolute result directory.
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = oracles
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.operators.Similarity.GraftOutToken, outAbs)
          .replace(graft.operators.TextAnalysis.BpeMergesToken, bpeValues))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
