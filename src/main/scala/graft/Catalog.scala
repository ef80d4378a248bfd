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
  * Views are lazy plans — registering costs nothing until queried — with
  * one honest exception: [[ModelBearing]] queries execute Spark jobs at
  * plan-BUILD time (IVF quantizer training, component-resolution
  * convergence), so they are excluded from `register` by default and only
  * built when `materializeModels = true`.
  */
object Catalog {
  /** Queries whose DataFrame CONSTRUCTION runs driver-coordinated Spark
    * jobs (model state / iterative convergence), not just plan building:
    * q_knn_ivf trains the IVF coarse quantizer (Lloyd iterations),
    * q_dedup_resolve runs the star-contraction loop plus verification,
    * q_text_bpe trains the BPE merge table. */
  val ModelBearing: Set[String] = Set("q_knn_ivf", "q_dedup_resolve", "q_text_bpe")
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

  /** q_distinct_slices — the interactive slicing surface
    * (`server/data_loader.py:13-16` / `dataset_viewer.py`): the distinct
    * filter values of every user-facing dimension in ONE long skinny
    * frame, cheap to compute (per-side distinct is dim-cardinality) and
    * cheap to cache client-side. */
  def distinctSlices(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val countries = Tables.nation(spark, dir)
      .select(lit("country").as("dim"), col("n_name").as("value")).distinct()
    val products = Tables.part(spark, dir)
      .select(lit("product").as("dim"), col("p_brand").as("value")).distinct()
    val markets = Tables.supplier(spark, dir)
      .select(lit("market").as("dim"), col("s_name").as("value")).distinct()
    countries.unionAll(products).unionAll(markets)
  }

  val distinctSlicesOracle: String =
    """SELECT DISTINCT 'country' AS dim, n_name AS value FROM nation
      |UNION ALL
      |SELECT DISTINCT 'product' AS dim, p_brand AS value FROM part
      |UNION ALL
      |SELECT DISTINCT 'market' AS dim, s_name AS value FROM supplier""".stripMargin

  def register(spark: SparkSession, dir: String, materializeModels: Boolean = false): Unit = {
    TableLoaders.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (materializeModels || !ModelBearing(name))
        fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
  }
}
