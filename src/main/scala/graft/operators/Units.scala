package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit-string parsing and normalization to kilograms.
  *
  * Reference: `dbt/models/staging/stg_cleaned_units.sql` — regex-extract the
  * numeric prefix and unit token from strings like `'1.5 KG'`, map unit
  * tokens to kg conversion factors, and derive `price_per_kg = price /
  * value_in_kg` with a zero/NULL guard (`stg_transactions.sql:44-56`).
  *
  * The harness schema has no free-text unit column, so a deterministic unit
  * string is derived per part (`p_size` + a type-keyed unit token) and then
  * parsed back through the same regex + CASE pipeline the reference uses —
  * the operator under test is the parse/normalize, which is pure scalar
  * (codegen'd, no shuffle, pushdown-friendly at any scale).
  */
object Units {

  /** Unit token per part type — stands in for the reference's raw unit text. */
  def unitToken(pType: Column): Column =
    when(pType === "SMALL", lit("g"))
      .when(pType === "ECONOMY", lit("kg"))
      .when(pType === "MEDIUM", lit("lb"))
      .when(pType === "LARGE", lit("mt"))
      .when(pType === "PROMO", lit("ml"))
      .otherwise(lit("l"))

  /** Conversion factor to kg for one unit of `unitType`
    * (stg_cleaned_units.sql:27-41). */
  def kgFactor(unitType: Column): Column =
    when(lower(unitType).isin("kg", "kgs"), lit(1.0))
      .when(lower(unitType).isin("g", "gr", "gram", "grams"), lit(1.0) / 1000)
      .when(lower(unitType).isin("mt", "metric ton", "tonne"), lit(1000.0))
      .when(lower(unitType).isin("lb", "lbs", "pound", "pounds"), lit(0.453592))
      .when(lower(unitType).isin("ml", "milliliter", "milliliters"), lit(1.0) / 1000000)
      .when(lower(unitType).isin("l", "liter", "liters"), lit(1.0) / 1000)
      .otherwise(lit(null).cast(DoubleType))

  /** q_unit_normalize — parse `<num> <unit>` and derive value_in_kg. */
  def unitNormalize(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val unitStr =
      concat(col("p_size").cast(StringType), lit(" "), unitToken(col("p_type")))
    p.select(col("p_partkey"), unitStr.as("unit_name"))
      .withColumn("unit_value", regexp_extract(col("unit_name"), "^([0-9.]+)", 1))
      .withColumn("unit_type", trim(regexp_replace(col("unit_name"), "^([0-9.]+)", "")))
      .withColumn(
        "value_in_kg",
        when(col("unit_value") =!= "", col("unit_value").cast(DoubleType) * kgFactor(col("unit_type"))))
      .select(col("p_partkey"), col("unit_name"), col("unit_value"), col("unit_type"), col("value_in_kg"))
  }

  val unitNormalizeOracle: String =
    """WITH named AS (
      |  SELECT p_partkey,
      |    CAST(p_size AS VARCHAR) || ' ' ||
      |      CASE p_type WHEN 'SMALL' THEN 'g' WHEN 'ECONOMY' THEN 'kg'
      |        WHEN 'MEDIUM' THEN 'lb' WHEN 'LARGE' THEN 'mt'
      |        WHEN 'PROMO' THEN 'ml' ELSE 'l' END AS unit_name
      |  FROM part
      |), parsed AS (
      |  SELECT p_partkey, unit_name,
      |    COALESCE(REGEXP_EXTRACT(unit_name, '^([0-9.]+)', 1), '') AS unit_value,
      |    TRIM(REGEXP_REPLACE(unit_name, '^([0-9.]+)', '')) AS unit_type
      |  FROM named
      |)
      |SELECT p_partkey, unit_name, unit_value, unit_type,
      |  CASE WHEN unit_value != '' THEN CAST(unit_value AS DOUBLE) * (
      |    CASE WHEN LOWER(unit_type) IN ('kg','kgs') THEN 1.0
      |      WHEN LOWER(unit_type) IN ('g','gr','gram','grams') THEN 1.0/1000
      |      WHEN LOWER(unit_type) IN ('mt','metric ton','tonne') THEN 1000.0
      |      WHEN LOWER(unit_type) IN ('lb','lbs','pound','pounds') THEN 0.453592
      |      WHEN LOWER(unit_type) IN ('ml','milliliter','milliliters') THEN 1.0/1000000
      |      WHEN LOWER(unit_type) IN ('l','liter','liters') THEN 1.0/1000
      |      ELSE NULL END)
      |    ELSE NULL END AS value_in_kg
      |FROM parsed""".stripMargin

  /** q_price_per_unit — price_per_kg derivation with the reference's
    * fall-back-to-raw-price guard (stg_transactions.sql:49-53). Row-level:
    * pure broadcast join + scalar math, no fact shuffle. */
  def pricePerUnit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
    val units = broadcast(unitNormalize(spark, dir).select(col("p_partkey"), col("value_in_kg")))
    li.join(units, col("l_partkey") === col("p_partkey"), "left")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_partkey"),
        col("l_extendedprice").as("price"),
        when(col("value_in_kg").isNotNull && col("value_in_kg") > 0,
          col("l_extendedprice") / col("value_in_kg"))
          .otherwise(col("l_extendedprice"))
          .as("price_per_kg"))
  }

  val pricePerUnitOracle: String =
    """WITH named AS (
      |  SELECT p_partkey,
      |    CAST(p_size AS VARCHAR) || ' ' ||
      |      CASE p_type WHEN 'SMALL' THEN 'g' WHEN 'ECONOMY' THEN 'kg'
      |        WHEN 'MEDIUM' THEN 'lb' WHEN 'LARGE' THEN 'mt'
      |        WHEN 'PROMO' THEN 'ml' ELSE 'l' END AS unit_name
      |  FROM part
      |), parsed AS (
      |  SELECT p_partkey,
      |    COALESCE(REGEXP_EXTRACT(unit_name, '^([0-9.]+)', 1), '') AS unit_value,
      |    TRIM(REGEXP_REPLACE(unit_name, '^([0-9.]+)', '')) AS unit_type
      |  FROM named
      |), units AS (
      |  SELECT p_partkey,
      |    CASE WHEN unit_value != '' THEN CAST(unit_value AS DOUBLE) * (
      |      CASE WHEN LOWER(unit_type) IN ('kg','kgs') THEN 1.0
      |        WHEN LOWER(unit_type) IN ('g','gr','gram','grams') THEN 1.0/1000
      |        WHEN LOWER(unit_type) IN ('mt','metric ton','tonne') THEN 1000.0
      |        WHEN LOWER(unit_type) IN ('lb','lbs','pound','pounds') THEN 0.453592
      |        WHEN LOWER(unit_type) IN ('ml','milliliter','milliliters') THEN 1.0/1000000
      |        WHEN LOWER(unit_type) IN ('l','liter','liters') THEN 1.0/1000
      |        ELSE NULL END)
      |      ELSE NULL END AS value_in_kg
      |  FROM parsed
      |)
      |SELECT l_orderkey, l_linenumber, l_partkey,
      |  l_extendedprice AS price,
      |  CASE WHEN value_in_kg IS NOT NULL AND value_in_kg > 0
      |    THEN l_extendedprice / value_in_kg ELSE l_extendedprice END AS price_per_kg
      |FROM lineitem LEFT JOIN units ON l_partkey = p_partkey""".stripMargin
}
