package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Last-mile corpus EXPORT: the curated corpus leaves the engine as a
  * fixed set of training shards with a verifiable manifest.
  *
  * Reference scope: the reference's pipeline ends at warehouse tables a
  * dashboard reads; a training-data pipeline instead hands off to a
  * trainer that expects N stable shard files plus per-shard accounting
  * (docs / chars / tokens and an integrity checksum). Sharding is
  * CONTENT-keyed (md5 of the text, the [[TextAnalysis.trainSplit]]
  * discipline) so shard membership is reproducible in any engine,
  * independent of row order, partitioning, or ingest history — the
  * property that lets a re-run of the pipeline produce byte-comparable
  * shards, and lets the DuckDB oracle check the manifest exactly.
  *
  * The checksum is a BIT_XOR of a 60-bit md5 prefix per document:
  * order-independent (XOR is commutative/associative — any partitioning
  * gives the same value), engine-portable (both engines reduce the same
  * hex prefix to the same integer), and sensitive to any added, dropped
  * or modified document. Not cryptographic — an integrity/consistency
  * check, not a tamper proof.
  *
  * Scale shape: manifest = one kernel scan (TextStats for chars/tokens,
  * one md5 per doc) + one NShards-cardinality aggregate — map-side
  * combined, no joins. The shard WRITE is one hash repartition on the
  * shard key, one file per shard ([[Dedup.compactPostings]]' layout
  * argument: the trainer opens N files, not N x tasks).
  */
object Export {

  /** Fixed shard count — the trainer-facing contract. */
  val NShards = 32

  /** 0-based shard id from the text's md5 (first byte mod [[NShards]]). */
  private def shardOf(text: org.apache.spark.sql.Column) =
    (conv(substring(md5(text), 1, 2), 16, 10).cast(IntegerType) % NShards).as("shard")

  /** 60-bit per-doc checksum term (15 hex chars — below the BIGINT sign
    * bit in both engines). */
  private def docHashOf(text: org.apache.spark.sql.Column) =
    conv(substring(md5(text), 1, 15), 16, 10).cast(LongType)

  /** q_export_manifest — per-shard accounting of the would-be export:
    * docs, chars, whitespace tokens, XOR checksum. */
  def exportManifest(spark: SparkSession, dir: String): DataFrame =
    manifestOf(Tables.documents(spark, dir))

  /** DataFrame core of [[exportManifest]] — any (doc_id, text) frame. */
  def manifestOf(d: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(d.sparkSession)
    d.select(
      shardOf(col("text")),
      call_function(GraftFunctions.TextStatsName, col("text")).as("ts"),
      docHashOf(col("text")).as("h"))
      .select(col("shard"), col("ts.n_chars").as("nc"),
        col("ts.n_ws_tokens").as("nt"), col("h"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nc").cast(LongType)).as("n_chars"),
        sum(col("nt").cast(LongType)).as("n_tokens"),
        bit_xor(col("h")).as("checksum"))
  }

  val exportManifestOracle: String =
    s"""SELECT CAST(CAST(CONCAT('0x', SUBSTR(MD5(text), 1, 2)) AS INT) % $NShards AS INT) AS shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
       |  CAST(SUM(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))) AS BIGINT) AS n_tokens,
       |  BIT_XOR(CAST(CONCAT('0x', SUBSTR(MD5(text), 1, 15)) AS BIGINT)) AS checksum
       |FROM documents
       |GROUP BY 1""".stripMargin

  /** Write the corpus as exactly [[NShards]] shard files under `outDir`
    * (`shard=K/` partition dirs, ONE parquet file each — the hash
    * repartition sends each shard's rows to one task), returning the
    * manifest computed from what was WRITTEN (read back, not assumed):
    * the caller compares it against [[manifestOf]] of the input to
    * prove the export lost nothing. */
  def writeTrainingShards(spark: SparkSession, docs: DataFrame, outDir: String): DataFrame = {
    docs
      .select(col("doc_id"), col("text"), shardOf(col("text")))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    manifestOf(spark.read.parquet(outDir))
  }
}
