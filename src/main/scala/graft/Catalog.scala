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
  /** Loaders shared with the operators (memoized plans, and the events
    * nanos-as-long conf is applied before parquet schema resolution). */
  val TableLoaders: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "region" -> Tables.region _,
    "nation" -> Tables.nation _,
    "customer" -> Tables.customer _,
    "supplier" -> Tables.supplier _,
    "part" -> Tables.part _,
    "orders" -> Tables.orders _,
    "lineitem" -> Tables.lineitem _,
    "events" -> Tables.events _,
    "documents" -> Tables.documents _,
    "embeddings" -> Tables.embeddings _)

  val TableNames: Seq[String] = TableLoaders.keys.toSeq.sorted

  def register(spark: SparkSession, dir: String): Unit = {
    TableLoaders.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
  }
}
