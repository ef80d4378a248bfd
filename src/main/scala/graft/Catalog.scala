package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: registers every base table and every graft operator as a
  * temp view, so SQL-first consumers (the reference's dashboard/dbt
  * users) can query the engine without touching the Scala API:
  *
  * {{{
  *   graft.Catalog.register(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT * FROM graft_q_monthly_trend WHERE brand = 'Brand#2'")
  * }}}
  *
  * Views are lazy plans — registering costs nothing until queried, and
  * every view inherits the operators' pushdown/broadcast behavior.
  */
object Catalog {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    TableNames.filterNot(_ == "events").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    // events goes through Tables so the nanos-as-long conf is set before
    // parquet schema resolution (Spark 4 rejects TIMESTAMP(NANOS))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
  }
}
