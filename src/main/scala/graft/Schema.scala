package graft

import java.time.LocalDateTime

/** Typed row models for every harness table — the `Dataset[T]` surface
  * for callers who want compile-time safety (SURVEY §4: `Dataset[T]`
  * where type safety helps, `DataFrame` where schema is dynamic).
  *
  * Types mirror the parquet physical schema exactly: order/lineitem
  * dates are TIMESTAMP_NTZ (-> LocalDateTime), and `Event.ts` is the
  * epoch-nanosecond long that `Tables.events` exposes (Spark 4 has no
  * nanosecond timestamp type).
  */
object Schema {
  case class Region(r_regionkey: Int, r_name: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)
  case class Part(
      p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)
  case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double,
      l_returnflag: String, l_linestatus: String, l_shipdate: LocalDateTime)
  case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  /** `ts` is epoch nanoseconds (see Tables.events). */
  case class Event(
      event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double, props: String)
}

/** Typed loaders over [[Tables]]. */
object TypedTables {
  import org.apache.spark.sql.{Dataset, SparkSession}
  import Schema._

  def region(spark: SparkSession, dir: String): Dataset[Region] = {
    import spark.implicits._; Tables.region(spark, dir).as[Region]
  }
  def nation(spark: SparkSession, dir: String): Dataset[Nation] = {
    import spark.implicits._; Tables.nation(spark, dir).as[Nation]
  }
  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._; Tables.customer(spark, dir).as[Customer]
  }
  def supplier(spark: SparkSession, dir: String): Dataset[Supplier] = {
    import spark.implicits._; Tables.supplier(spark, dir).as[Supplier]
  }
  def part(spark: SparkSession, dir: String): Dataset[Part] = {
    import spark.implicits._; Tables.part(spark, dir).as[Part]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._; Tables.orders(spark, dir).as[Order]
  }
  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._; Tables.lineitem(spark, dir).as[Lineitem]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._; Tables.documents(spark, dir).as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._; Tables.embeddings(spark, dir).as[Embedding]
  }
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._; Tables.events(spark, dir).as[Event]
  }
}
