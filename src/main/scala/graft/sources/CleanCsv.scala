package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Encoding-tolerant CSV ingestion with ASCII scrubbing.
  *
  * Reference: `utils/csv_utils.py:clean_csv_file` — the reference reads
  * each file with a utf-8 -> latin1 -> iso-8859-1 fallback chain in pandas,
  * strips non-ASCII from every string column, and writes a cleaned copy.
  * Re-expressed Spark-first: ONE distributed read (charset option +
  * PERMISSIVE mode with a corrupt-record column) and the scrub as a
  * projection — no driver-side file rewrite, no second pass over the data;
  * at 100 TB the scrub is free inside the scan stage.
  */
object CleanCsv {

  val CorruptCol = "_corrupt_record"

  /** Strip non-ASCII characters (the reference's
    * `str.encode('ascii','ignore')`). */
  def asciiScrub(c: Column): Column = regexp_replace(c, "[^\\x00-\\x7F]", "")

  /** Read a CSV with permissive parsing; malformed lines land in
    * `_corrupt_record` instead of failing the job. */
  def read(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      charset: String = "UTF-8",
      header: Boolean = true): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("charset", charset)
      .option("multiLine", "false")
    val df = schema match {
      case Some(s) => r.schema(s.add(CorruptCol, "string")).csv(path)
      case None    => r.option("inferSchema", "true").csv(path)
    }
    df
  }

  /** Normalize a raw column name (`scripts/columns_parser.py:
    * clean_column_name`): lowercase, spaces to underscores, strip
    * non-alphanumerics, prefix names that start with a digit. */
  def cleanColumnName(name: String): String = {
    val base = name.trim.toLowerCase.replace(" ", "_")
      .filter(ch => ch.isLetterOrDigit || ch == '_')
    if (base.nonEmpty && base.head.isDigit) s"col_$base" else base
  }

  /** Apply [[cleanColumnName]] to every column of a frame. */
  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(cleanColumnName): _*)

  /** Generate a CREATE TABLE statement from a frame's schema
    * (columns_parser.py:generate_sql_schema, but type-aware instead of
    * all-TEXT). */
  def sqlSchema(df: DataFrame, tableName: String): String = {
    val cols = df.schema.fields
      .map(f => s"    ${cleanColumnName(f.name)} ${f.dataType.sql}")
      .mkString(",\n")
    s"CREATE TABLE $tableName (\n$cols\n);"
  }

  /** Read + scrub every string column to ASCII (the full csv_utils.py
    * behavior as one lazy plan). */
  def readClean(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      charset: String = "UTF-8"): DataFrame = {
    val df = read(spark, path, schema, charset)
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType.typeName == "string" && f.name != CorruptCol)
        acc.withColumn(f.name, asciiScrub(col(f.name)))
      else acc
    }
  }
}
