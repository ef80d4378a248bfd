package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingestion with the same permissive/quarantine contract as
  * [[CleanCsv]]: malformed records land in `_corrupt_record` instead of
  * failing the job, and an explicit schema avoids the driver-side
  * inference scan (mandatory at 100 TB — schema inference reads data
  * twice).
  */
object JsonSource {
  def read(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CleanCsv.CorruptCol)
    schema match {
      case Some(s) => r.schema(s.add(CleanCsv.CorruptCol, "string")).json(path)
      case None    => r.json(path)
    }
  }
}
