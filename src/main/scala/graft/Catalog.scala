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
    * q_text_bpe trains the BPE merge table, q_knn_pq builds (or
    * freshness-probes) the persisted PQ code generation,
    * q_quality_classifier runs gradient-descent training. */
  val ModelBearing: Set[String] =
    Set("q_knn_ivf", "q_dedup_resolve", "q_text_bpe", "q_knn_pq",
      "q_knn_ivfpq", "q_knn_opq", "q_quality_classifier",
      "q_dedup_embedding_resolve", "q_contamination_delta")
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

  /** q_column_profile — the dataset viewer's column statistics panel
    * (`server/pages/dataset_viewer.py:32-52` `show_data_statistics`):
    * per column, dtype / non-null / null / distinct counts plus the
    * record total, over the browsing extract. ONE aggregate over the
    * frame — Catalyst plans the N count-distincts via a single Expand
    * pass with map-side partials, not per-column jobs; the per-column
    * rows are then unpivoted from the one aggregate row. Counts are
    * exact; [[columnProfileApprox]] is the 100 TB swap (HLL sketches,
    * no Expand multiplication), spec-gated within its rsd. */
  def columnProfile(df: org.apache.spark.sql.DataFrame, approx: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fields = df.schema.fields.toSeq
    val nd: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (approx) approx_count_distinct(_) else count_distinct(_)
    val aggs = count(lit(1)).as("total_records") +:
      fields.flatMap(f => Seq(
        count(col(f.name)).as(s"__nn_${f.name}"),
        nd(col(f.name)).as(s"__nd_${f.name}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(i).as("ordinal"),
        lit(f.name).as("column_name"),
        lit(f.dataType.sql).as("data_type"),
        col(s"__nn_${f.name}").as("non_null"),
        (col("total_records") - col(s"__nn_${f.name}")).as("nulls"),
        col(s"__nd_${f.name}").as("distinct_vals"),
        col("total_records"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** The 100 TB form of [[columnProfile]]: `approx_count_distinct` HLL
    * sketches merge associatively in one ordinary pass — no Expand
    * row multiplication, no exact-distinct shuffle per column. HLL is
    * deliberately NOT unified onto the engine's KLL sketch (the
    * quantile surfaces' shared state, [[graft.functions.KllSketch]]):
    * distinct counting is a cardinality estimation problem and KLL is a
    * rank/quantile sketch — the two are information-theoretically
    * different summaries, so each surface gets the sketch built for it. */
  def columnProfileApprox(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    columnProfile(df, approx = true)

  /** The browsing extract's static column inventory, shared by the
    * operator's oracle renderer and the schema-drift spec (names and
    * Spark SQL type strings must match [[StarSchema.mlExtract]]). */
  private[graft] val MlExtractProfileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "BIGINT",
    "l_linenumber" -> "INT",
    "constructed_date" -> "DATE",
    "product_name" -> "STRING",
    "country" -> "STRING",
    "price" -> "DOUBLE",
    "price_usd" -> "DOUBLE")

  /** Oracle for q_column_profile, rendered from the SAME column
    * inventory the Spark side profiles — per-column UNION ALL branches
    * over one aggregate CTE, dtype strings emitted as identical
    * literals on both sides. */
  val columnProfileOracle: String = {
    val aggExprs = "COUNT(*) AS total" +: MlExtractProfileCols.zipWithIndex.flatMap {
      case ((name, _), i) =>
        Seq(s"COUNT($name) AS nn$i", s"COUNT(DISTINCT $name) AS nd$i")
    }
    val branches = MlExtractProfileCols.zipWithIndex.map { case ((name, dt), i) =>
      s"SELECT $i AS ordinal, '$name' AS column_name, '$dt' AS data_type, " +
        s"nn$i AS non_null, total - nn$i AS nulls, nd$i AS distinct_vals, " +
        s"total AS total_records FROM agg"
    }
    s"""WITH base AS (${operators.StarSchema.mlExtractOracle}),
       |agg AS (SELECT ${aggExprs.mkString(", ")} FROM base)
       |${branches.mkString("\nUNION ALL\n")}""".stripMargin
  }

  def register(spark: SparkSession, dir: String, materializeModels: Boolean = false): Unit = {
    TableLoaders.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
    // the RAW constructors, not the serving-wrapped ones: a temp view
    // must bind to THIS session's catalog, and SQL-surface users get
    // the default execution profile (the lane is a serving-layer
    // choice, not part of the view contract)
    SparkEntry.rawQueries.foreach { case (name, fn) =>
      if (materializeModels || !ModelBearing(name))
        fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
  }
}
