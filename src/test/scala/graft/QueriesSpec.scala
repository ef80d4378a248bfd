package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Smoke + semantics checks for every SparkEntry query at sf0.001.
  * (The DuckDB hash-parity gate is driver-side; these specs assert the
  * invariants the oracle can't see: schema shape, plan properties, and
  * spot values.)
  */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("graft-test")

  override def afterAll(): Unit = spark.stop()

  test("every registered query runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every oracle entry has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry flagship returns the 6 flag/status groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum > 0)
  }

  test("pricing summary pushes the shipdate filter to the parquet scan") {
    val plan = operators.PricingSummary(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("star join broadcasts dimensions (no fact-side shuffle for dims)") {
    val plan = operators.StarSchema.starJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }

  test("unit normalization maps every part to a positive kg factor") {
    val bad = operators.Units.unitNormalize(spark, sf)
      .filter("value_in_kg IS NULL OR value_in_kg <= 0").count()
    assert(bad == 0)
  }

  test("mean imputation leaves valid rows untouched and fills invalid ones") {
    val df = operators.Impute.meanImpute(spark, sf)
    assert(df.filter("c_acctbal >= 0 AND acctbal_imputed != c_acctbal").count() == 0)
    assert(df.filter("c_acctbal < 0 AND acctbal_imputed < 0").count() == 0)
  }

  test("group mean imputation fills from the row's own nation") {
    val df = operators.Impute.groupMeanImpute(spark, sf)
    assert(df.filter("acctbal_imputed IS NULL").count() == 0)
  }
}
