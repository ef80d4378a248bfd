package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k per group ranking ("best markets" / "best products").
  *
  * Reference: `server/pages/best_markets.py` (cheapest markets for a
  * product) and `server/pages/best_products.py:forecast_best_products`
  * (products ranked by average price, `sorted(...)[:top_n]`). The
  * reference ranks forecasted prices driver-side per selection; here the
  * ranking is computed for ALL groups in one distributed pass.
  *
  * Scale notes: the fact is first reduced to (brand x supplier)
  * cardinality with a map-side-combined aggregate; the rank window then
  * runs partitioned by brand on the aggregate, so the windowed data is
  * bounded by group-combination cardinality, not fact rows. Tie-break on
  * the name column makes row_number deterministic.
  */
object TopK {

  /** q_topk_per_group — 3 cheapest suppliers (markets) per brand by
    * average price.
    *
    * The heavy aggregate groups on `(p_brand, l_suppkey)` — an int key
    * already on the fact — and the 25-char supplier name is attached by
    * broadcast join AFTER the reduction, so the fact-volume shuffle
    * carries 8-byte keys instead of riding `s_name` on every row (and the
    * supplier dim never touches the fact at all). Identical result:
    * `s_suppkey -> s_name` is the supplier primary key. */
  def topkPerGroup(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    val s = broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")))
    // Single-shuffle grouped-mean ranking ([[graft.functions
    // .TopKMeanCollect]]): the aggregate groups by brand ONLY, carrying
    // per-supplier (long-cents sum, count) partials in a primitive map —
    // map-side combine reduces the fact exactly as the two-level
    // `groupBy(brand, suppkey)` did, but the plan pays ONE exchange (by
    // brand) instead of two plus a rank window/sort. Mean math stays the
    // bit-exact long-cents form (sum/100.0/n). Ordering: mean ASC, then
    // suppkey ASC — identical to the oracle's market_name tie-break
    // because s_name embeds the zero-padded suppkey ('Supplier#%09d',
    // TPC-H spec 4.2.3), so lexicographic name order IS numeric key
    // order. The supplier name attaches by broadcast AFTER ranking (k x
    // brands rows), so the dim never touches the fact.
    li.join(p, col("l_partkey") === col("p_partkey"))
      // cents are materialized by a codegen'd Project BEFORE the
      // aggregate: a TypedImperativeAggregate evaluates its child
      // expressions interpreted per input row, so the cast chain must
      // not live inside the agg (measured ~30% of the query). The
      // pure-FP half-up form floor(x*100 + 0.5) replaces the decimal
      // chain (dec2(x)*100).cast(long) — one fused FP instruction vs a
      // BigDecimal allocation per fact row. Equal BY PRECONDITION, not
      // in general: source prices are exact 2-decimal values (TPC-H
      // money), where both round to the same cent — property-tested in
      // GraftProps ("fp cents match decimal cents"); data with full
      // double precision must keep the decimal form.
      .select(
        col("p_brand").as("brand"),
        col("l_suppkey").cast("long").as("suppkey"),
        floor(col("l_extendedprice") * lit(100) + lit(0.5)).as("cents"))
      .groupBy(col("brand"))
      .agg(call_function(
        graft.functions.GraftFunctions.TopKMeanName,
        col("suppkey"),
        col("cents"),
        lit(k)).as("top"))
      .select(col("brand"), posexplode(col("top")))
      .select(
        col("brand"),
        col("col.id").as("l_suppkey"),
        col("col.avg").as("avg_price"),
        col("col.n").as("n_obs"),
        (col("pos") + 1).cast("int").as("rk"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("brand"), col("s_name").as("market_name"), col("avg_price"), col("n_obs"), col("rk"))
  }

  // ------------------------------------------------- bounded-heap variant

  case class LiRow(brand: String, l_orderkey: Long, l_linenumber: Int, price: Double)

  /** Typed bounded-top-k aggregator — kept ONLY as the independent
    * reference implementation the native kernel is spec-checked against
    * (its `List` buffer pays an ExpressionEncoder round-trip per
    * partial-merge; production ranking goes through
    * [[graft.functions.TopKCollect]]). Each map task keeps only k rows per
    * group, so the shuffle moves O(groups x k) rows instead of the whole
    * fact — THE scalable form of per-group top-k (a `row_number()` window
    * over raw fact rows sorts every partition and shuffles everything).
    * Deterministic ordering: price desc, then (orderkey, linenumber). */
  class TopKRowsAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[LiRow, List[LiRow], List[LiRow]] {
    private val ord: Ordering[LiRow] =
      Ordering.by((r: LiRow) => (-r.price, r.l_orderkey, r.l_linenumber.toLong))

    override def zero: List[LiRow] = Nil

    // sorted-buffer insertion: most rows fail the cutoff in O(k) compares
    // with no allocation (see TopKScoredAgg)
    override def reduce(buf: List[LiRow], row: LiRow): List[LiRow] =
      if (buf.lengthCompare(k) >= 0 && ord.compare(row, buf.last) >= 0) buf
      else {
        val (better, rest) = buf.span(r => ord.compare(r, row) <= 0)
        (better ::: (row :: rest)).take(k)
      }

    override def merge(a: List[LiRow], b: List[LiRow]): List[LiRow] =
      (a ++ b).sorted(ord).take(k)

    override def finish(r: List[LiRow]): List[LiRow] = r.sorted(ord)

    override def bufferEncoder: org.apache.spark.sql.Encoder[List[LiRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[LiRow]]()

    override def outputEncoder: org.apache.spark.sql.Encoder[List[LiRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[LiRow]]()
  }

  /** q_topk_rows — 3 highest-priced raw line items per brand via the
    * native bounded-heap aggregate (no window sort over the fact, no
    * Dataset encoder round-trip: the whole query stays in Tungsten rows
    * and the heap buffer is three primitive arrays — see
    * [[graft.functions.TopKCollect]]). */
  def topkRows(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    li.join(p, col("l_partkey") === col("p_partkey"))
      // casts pre-projected so the agg's children are bare column reads
      // (unboxed update fast path — see TopKCollect)
      .select(
        col("p_brand").as("brand"),
        col("l_extendedprice").as("price"),
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("ln"))
      .groupBy(col("brand"))
      .agg(call_function(
        graft.functions.GraftFunctions.TopKName,
        col("price"),
        col("l_orderkey"),
        col("ln"),
        lit(k)).as("top"))
      .select(col("brand"), posexplode(col("top")))
      .select(
        col("brand"),
        col("col.id_a").as("l_orderkey"),
        col("col.id_b").cast("int").as("l_linenumber"),
        col("col.score").as("price"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  val topkRowsOracle: String =
    """SELECT brand, l_orderkey, l_linenumber, price, rk FROM (
      |  SELECT p_brand AS brand, l_orderkey, l_linenumber,
      |    l_extendedprice AS price,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rk
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |) WHERE rk <= 3""".stripMargin

  val topkPerGroupOracle: String =
    """SELECT brand, market_name, avg_price, n_obs, rk FROM (
      |  SELECT brand, market_name, avg_price, n_obs,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY brand ORDER BY avg_price, market_name) AS INT) AS rk
      |  FROM (
      |    SELECT p_brand AS brand, s_name AS market_name,
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
      |      COUNT(*) AS n_obs
      |    FROM lineitem
      |    JOIN part ON l_partkey = p_partkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    GROUP BY 1, 2
      |  )
      |) WHERE rk <= 3""".stripMargin
}
