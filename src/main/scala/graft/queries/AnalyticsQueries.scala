package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational-primitive queries over the driver-generated TPC-H-ish tables.
  *
  * These pin the Spark primitives the crawl engine is built from (SURVEY.md
  * §2.3-§2.7: inner/anti/semi joins, hash aggregation, windows, top-k, set
  * ops) with exact DuckDB oracles. Money columns are compared in integer
  * cents (ROUND(x*100) AS BIGINT) so Spark and DuckDB aggregate exactly the
  * same integers — no float-summation drift in the hash compare.
  */
object AnalyticsQueries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def cents(c: String): org.apache.spark.sql.Column =
    round(col(c) * 100).cast("long")

  /** Hash aggregation with map-side partial agg (A-family). */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        sum(cents("l_extendedprice")).as("sum_base_cents"),
        count(lit(1)).as("count_order"))

  /** Broadcast inner join + aggregation (J1 analogue). */
  def joinAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .join(broadcast(t(spark, sfDir, "customer")),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(cents("o_totalprice")).as("revenue_cents"),
        count(lit(1)).as("n_orders"))

  /** Left-anti join (J2 analogue: customers with no orders before mid-1995 —
    * the date filter keeps the result non-trivially non-empty).
    */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders").filter(col("o_orderdate") < lit("1995-07-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Left-semi join (seen-set membership analogue). */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .join(t(spark, sfDir, "lineitem"),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))

  /** Running-sum window over (user_id, ts) — the W1 (depth,seq) shape. */
  def windowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "events")
      .withColumn("v100", floor(col("value") * 100).cast("long"))
      .withColumn("running_v100", sum(col("v100")).over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("event_id"), col("user_id"), col("rn"), col("running_v100"))
  }

  /** Global top-k with deterministic tie-break (L2 analogue). */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .withColumn("price_cents", cents("o_totalprice"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(20)
      .select(col("o_orderkey"), col("price_cents"))

  /** Union + distinct (U2 seen-set union analogue). */
  def unionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(col("o_custkey").as("custkey"))
    val c = t(spark, sfDir, "customer").select(col("c_custkey").as("custkey"))
    o.union(c).distinct()
  }

  /** Multi-way join through a dimension chain (broadcast dims). */
  def dimChain(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(broadcast(t(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, sfDir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(cents("c_acctbal")).as("acctbal_cents"))
}
