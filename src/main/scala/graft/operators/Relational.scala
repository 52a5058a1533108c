package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** General relational operator surface over the TPC-H-ish driver tables —
  * the query capabilities the engine shares with any SQL engine, expressed
  * declaratively so Catalyst applies pushdown/pruning/join-strategy
  * selection (SURVEY.md §2.1-2.8 mapping).
  *
  * Scale notes: joins put the small side in a `broadcast()` hint (nation/
  * region/supplier are classic broadcast dims); aggregations rely on
  * map-side partial agg; every query ends with an explicit orderBy on a
  * key for deterministic, oracle-comparable output. Computed doubles are
  * rounded to fixed decimals so double-summation-order ulps can't flip a
  * hash comparison.
  */
object Relational {

  /** A1-style grouped aggregation (TPC-H Q1 shape): scan → filter →
    * groupBy → 8 aggregates → sort. Filter + column pruning push to
    * parquet. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Multi-way join: lineitem ⋈ orders ⋈ customer with a broadcast dim,
    * grouped revenue per market segment (Q3 family). */
  def revenueBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_mktsegment"))
  }

  /** Window functions: per-customer order ranking + running totals. */
  def orderRanks(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .withColumn("running_spend",
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("o_totalprice", round(col("o_totalprice"), 2))
      .filter(col("rn") <= 3)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("rn"), col("running_spend"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Top-k: 10 highest-revenue orders (TakeOrderedAndProject — per
    * partition heap, no global sort). */
  def topOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Semi/anti join surface: customers with no orders (left_anti). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Scalar-function + conditional projection surface (F1/F2 family):
    * CASE / coalesce / date parts / string ops over orders. */
  def orderFacets(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        when(col("o_totalprice") > 200000d, lit("big"))
          .when(col("o_totalprice") > 50000d, lit("mid"))
          .otherwise(lit("small")).as("bucket"),
        upper(col("o_orderpriority")).as("prio"),
        length(col("o_orderstatus")).as("status_len"))
      .orderBy(col("o_orderkey"))
  }

  /** Set operations (U1/U3 family): nations with customers but no
    * suppliers (EXCEPT), plus nations with both (INTERSECT), tagged and
    * unioned. */
  def nationPresence(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    c.except(s).withColumn("presence", lit("customers_only"))
      .unionAll(c.intersect(s).withColumn("presence", lit("both")))
      .orderBy(col("nationkey"), col("presence"))
  }

  /** Grouping-sets style multi-level aggregate via rollup (beyond the
    * reference — standard engine capability). */
  def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Broadcast-dim join chain lineitem→supplier→nation→region: revenue
    * per region (classic snowflake rollup; every dim side broadcast). */
  def revenueByRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    li.join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count_distinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("r_name"))
  }

  /** Distinct aggregation + HAVING: part brands with enough distinct
    * sizes (the group filter runs post-aggregation). */
  def brandSizes(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    p.groupBy(col("p_brand"))
      .agg(count_distinct(col("p_size")).as("n_sizes"),
        round(sum(col("p_retailprice")), 2).as("sum_price"),
        count(lit(1)).as("n_parts"))
      .filter(col("n_sizes") >= 5)
      .orderBy(col("p_brand"))
  }

  /** Correlated-EXISTS semantics: customers with at least one order over
    * a threshold (left_semi — Catalyst's EXISTS plan). */
  def bigSpenders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o.filter(col("o_totalprice") > 300000d),
        c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** CUBE multi-level aggregate over two dimensions. */
  def cubeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Pivot: event counts per user spread across event-type columns
    * (compiles to conditional aggregation — the oracle states it as CASE
    * sums, which is exactly what Catalyst lowers pivot to). */
  def eventPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))
  }

  /** As-of join (no built-in in Spark): for every 'click' event, the most
    * recent 'view' of the same user at or before it. Implemented with the
    * union + windowed last_value(ignoreNulls) pattern — a single
    * partitioned sort, no range-join explosion; DuckDB's native ASOF JOIN
    * is the oracle. */
  def clickAfterView(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val tagged = e.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"),
      when(col("event_type") === "view", col("ts")).as("view_ts"))
    // views sort BEFORE other events at an equal timestamp so "at or
    // before" includes a view tied with the click (matches the oracle's
    // v.ts <= c.ts semantics regardless of event_id order)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === "view", lit(0)).otherwise(lit(1)),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click" && col("last_view_ts").isNotNull)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("last_view_ts"))
      .orderBy(col("user_id"), col("click_id"))
  }

  /** Event-time tumbling-window aggregation over the events table (batch
    * twin of the Structured Streaming query in streaming/StreamOps). */
  def eventWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
      .orderBy(col("ws"), col("event_type"))
  }
}
