package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Money/measure columns in the driver data carry exactly 2 decimals
    * (stored as double). Summing raw doubles is order-nondeterministic —
    * partial-aggregate merge order varies run to run, and a sum landing
    * near a rounding half-boundary flips the emitted value (the observed
    * s1 flake class). Casting each value to an exact DECIMAL first makes
    * the sum exact and order-independent while keeping map-side partial
    * aggregation (unlike sort-and-fold workarounds), then any rounding
    * happens in exact decimal space before the final cast to double. */
  private def money(c: Column): Column = c.cast("decimal(12,2)")
  private def frac(c: Column): Column = c.cast("decimal(3,2)")
  private val OneD = lit(1).cast("decimal(3,2)")

  /** A1-style grouped aggregation (TPC-H Q1 shape): scan → filter →
    * groupBy → 8 aggregates → sort. Filter + column pruning push to
    * parquet. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val discPrice = money(col("l_extendedprice")) * (OneD - frac(col("l_discount")))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        round(sum(discPrice), 2).cast("double").as("sum_disc_price"),
        round(sum(discPrice * (OneD + frac(col("l_tax")))), 2).cast("double").as("sum_charge"),
        round(sum(money(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(money(col("l_extendedprice"))).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(sum(frac(col("l_discount"))).cast("double") / count(lit(1)), 4).as("avg_disc"),
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
        round(sum(money(col("l_extendedprice")) * (OneD - frac(col("l_discount")))), 2)
          .cast("double").as("revenue"),
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
        sum(money(col("o_totalprice"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
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
      .agg(round(sum(money(col("l_extendedprice")) * (OneD - frac(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Semi/anti join surface: customers with no URGENT orders
    * (left_anti against a filtered build side). The filter is what
    * keeps the gate NON-VACUOUS at the driver scales — every customer
    * has SOME order at sf0.001/sf0.01, so the unfiltered anti join
    * returned 0 rows and the oracle compare was empty-vs-empty (the
    * r14 p5/p7/p9/p15 vacuity class, caught by the r15 floor audit). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
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
      .agg(sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
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
      .agg(round(sum(money(col("l_extendedprice")) * (OneD - frac(col("l_discount")))), 2)
        .cast("double").as("revenue"),
        count_distinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("r_name"))
  }

  /** Distinct aggregation + HAVING: part brands with enough distinct
    * sizes (the group filter runs post-aggregation). */
  def brandSizes(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    p.groupBy(col("p_brand"))
      .agg(count_distinct(col("p_size")).as("n_sizes"),
        sum(money(col("p_retailprice"))).cast("double").as("sum_price"),
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
      .agg(sum(money(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Explicit GROUPING SETS (the general form cube/rollup specialize):
    * a hand-picked lattice of aggregation levels in ONE pass — here
    * (status, priority), (status), (priority) and the grand total, i.e.
    * a cube minus nothing but stated explicitly. `grouping_id`
    * disambiguates a set's structural NULL from a data NULL, and is
    * part of the gated output. Same exchange profile as cube: one
    * shuffle of the expanded rows, map-side partials intact. */
  def groupingSetsRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id(col("o_orderstatus"), col("o_orderpriority"))
          .cast("bigint").as("gid"),
        sum(money(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
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
      // fill ONLY the pivot columns: an unscoped fill would also
      // rewrite a NULL user_id group key to 0, conflating it with the
      // real user 0
      .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
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
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,4)")).cast("double").as("total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
      .orderBy(col("ws"), col("event_type"))
  }

  /** BINNED RANGE JOIN — the scale rewrite of an inequality join: for
    * every click, count the same user's views within ±`tolSec`
    * seconds. The naive formulation (`ON u = u AND |tv − tc| ≤ tol`)
    * has no equi key for the time term, so Spark plans a broadcast
    * nested loop; binning each side into tol-width buckets and
    * exploding the probe side into {b−1, b, b+1} turns it into a PURE
    * EQUI JOIN on (user, bucket) — a 3× probe-row fan-out buys a
    * keyed shuffle join whose per-key volume is the true temporal
    * neighbourhood, not the cross product. The exact |Δt| ≤ tol
    * predicate re-filters after the join (bucket adjacency is a
    * superset), so the result is identical to the inequality join. */
  def clicksWithNearbyViews(spark: SparkSession, sfDir: String,
                            tolSec: Int = 300): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tc"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_timestamp(col("ts")).as("tv"))
      .withColumn("bucket", floor(col("tv") / tolSec))
    val probes = clicks
      .withColumn("b0", floor(col("tc") / tolSec))
      .withColumn("bucket",
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
    probes.join(views, Seq("user_id", "bucket"), "left")
      .groupBy(col("click_id"))
      .agg(sum(when(abs(col("tv") - col("tc")) <= tolSec, 1L)
        .otherwise(0L)).as("n_views_near"))
      .orderBy(col("click_id"))
  }

  /** Time-bucket GAP FILLING (resampling): hourly event counts per type
    * with missing buckets zero-filled over the corpus' [min, max] hour
    * span — the "no row ≠ no bucket" repair every downstream
    * time-series consumer (charting, anomaly detection, training-data
    * stats) needs; plain groupBy silently omits empty buckets.
    *
    * Shape at scale: counts are one map-side-combined keyed agg; the
    * dense (type × hour) grid is generated from a ONE-ROW extent
    * aggregate exploded through `sequence` and cross-joined against
    * the distinct types — grid size = types × hours, data-independent
    * — then a broadcast-able left join pulls the sparse counts onto
    * the dense axis. The fact table is scanned twice (extent + counts)
    * but never shuffled wider than the counts. */
  def gapFilledCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val bucketed = e.select(col("event_type"),
      date_trunc("hour", col("ts")).as("bucket"))
    // checkpointed: referenced by BOTH the grid's type set and the
    // dense join — without the break the fact scan + agg would run
    // twice (the relation is types x buckets rows, trivially small)
    val counts = bucketed.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val grid = bucketed.agg(min(col("bucket")).as("lo"),
        max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("bucket"))
      // the type set comes from the already-aggregated counts, not a
      // third scan of the fact table (types with zero rows overall
      // exist in neither relation, so the grids are identical)
      .crossJoin(counts.select(col("event_type")).distinct())
    grid.join(counts, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** EXACT heavy hitters — every key of `keyCol` with count > N/k,
    * with its exact count — via the two-pass sketch-then-verify plan:
    *
    *  1. CANDIDATES: one [[graft.functions.MisraGries]] aggregation
    *     (k counters, mergeable partials) yields a guaranteed superset
    *     of the > N/k keys while shuffling at most k (key, count)
    *     pairs per partition instead of the full key space. N rides
    *     along in the same job (a count(*) beside the sketch — no
    *     second scan for the threshold).
    *  2. VERIFY: re-count ONLY rows whose key is a candidate — the
    *     candidate array (≤ k keys) broadcasts into a semi-join
    *     filter, so the exact groupBy touches a vanishing fraction of
    *     rows and shuffles at most k groups.
    *
    * This is the 100 TB "top keys of a huge-cardinality column" shape:
    * a plain groupBy-then-filter shuffles every distinct key once;
    * this plan's exchanges are O(parts·k) + O(matching rows). The
    * output is EXACT (sketch error never reaches the answer), so the
    * oracle is plain GROUP BY / HAVING SQL.
    *
    * NULL keys are dropped up front (the [[exactHeavyHittersByGroup]]
    * policy): the sketch skips nulls and the string-cast verify filter
    * is null-unsafe, so without the explicit filter a null key that
    * cleared the threshold would silently vanish while still inflating
    * n — dropped from BOTH the candidates and the denominator instead. */
  def exactHeavyHitters(rows0: DataFrame, keyCol: String, k: Int): DataFrame = {
    import graft.functions.MisraGries
    val rows = rows0.filter(col(keyCol).isNotNull)
    val first = rows.agg(
      MisraGries.candidates(col(keyCol), k).as("cand"),
      count(lit(1)).as("n")).collect()(0)
    val cand = first.getAs[scala.collection.Seq[String]]("cand")
    val n = first.getAs[Long]("n")
    val verified = rows.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
    if (cand.isEmpty) verified.limit(0)
    else {
      val candCol = array(cand.map(lit(_)).toSeq: _*)
      rows.filter(array_contains(candCol, col(keyCol).cast("string")))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > n)
    }
  }

  /** PER-GROUP exact heavy hitters — [[exactHeavyHitters]] with both
    * the GROUP count and the KEY space unbounded: one keyed aggregation
    * computes each group's Misra-Gries candidate superset (≤ k−1 keys,
    * the guarantee is per-group because the aggregate is per-group)
    * plus its row count, then the verify pass joins rows to their own
    * group's candidates on (group, key) — an ordinary equi join, no
    * driver-side candidate collect (the global path's bounded-sidecar
    * shortcut doesn't survive unbounded groups) — and applies the exact
    * threshold cnt·k > n. Output is EXACT (the sketch only prunes).
    * Exchange: O(groups·k) candidate rows + the candidate-key row
    * subset; the per-domain stopword/top-talker primitive at 100 TB.
    * NULL groups AND null keys are dropped up front (the same policy
    * as [[exactHeavyHitters]], whose doc promises nulls out of both
    * candidates and denominator) — without the group filter the null
    * group's candidates would silently never match the null-unsafe
    * verify join, and without the key filter null-key rows would
    * inflate each group's denominator n while MisraGries skips them,
    * making the per-group threshold stricter than the global one. */
  def exactHeavyHittersByGroup(rows0: DataFrame, groupCol: String,
                               keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val rows = rows0.filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
    val cand = rows.groupBy(col(groupCol).as("g"))
      .agg(graft.functions.MisraGries.candidates(col(keyCol), k).as("cand"),
        count(lit(1)).as("n"))
    val candRel = cand.select(col("g"), col("n"), explode(col("cand")).as("ck"))
    rows
      .select(col(groupCol).as("g"), col(keyCol).cast("string").as("ck"))
      .join(candRel, Seq("g", "ck"))
      .groupBy(col("g"), col("ck"))
      .agg(count(lit(1)).as("cnt"), first(col("n")).as("n"))
      .filter(col("cnt") * k > col("n"))
      // the key returns as STRING — the sketch's key domain and the
      // verify join's key; cast back at the call site for native-typed
      // joins (the global path keeps the native type because its
      // verify filter, not its output, does the string casting)
      .select(col("g").as(groupCol), col("ck").as(keyCol), col("cnt"))
  }

  /** CHANGELOG COMPACTION (CDC apply / last-writer-wins merge) — the
    * lakehouse MERGE primitive: given a stream of keyed change records
    * (upserts and deletes), the surviving state is each key's LATEST
    * record, and a key whose latest record is a delete has no row.
    * This is Kafka log compaction / Delta CDF apply as one operator.
    *
    * Deterministic total order: (tsCol, seqCol) — a same-timestamp
    * pair resolves by the sequence id, so replays and the oracle agree.
    * Shape at scale: ONE keyed window (row_number over the per-key
    * exchange) + a filter; no join, no second shuffle. The per-key
    * history length doesn't matter — the exchange carries every change
    * row once, exactly like any keyed dedup. */
  def compactChangelog(changes: DataFrame, keyCol: String, tsCol: String,
                       seqCol: String, opCol: String,
                       valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col(opCol) =!= "delete")
      .select((keyCol +: tsCol +: valueCols).map(col): _*)
  }

  /** SCD TYPE-2 HISTORY BUILD — the interval twin of
    * [[compactChangelog]]: instead of keeping each key's latest state,
    * keep EVERY version as a validity interval — `valid_from` = the
    * change's own timestamp, `valid_to` = the key's NEXT change (NULL
    * while current), `is_current` = open-ended. This is the dimension-
    * history primitive (Kimball SCD2 / Delta time travel surrogate):
    * an as-of lookup becomes `valid_from <= t AND (valid_to > t OR
    * valid_to IS NULL)`.
    *
    * Tombstones participate in the window but emit no interval: a
    * delete CLOSES the previous version (its ts becomes that row's
    * `valid_to`) and a later re-insert starts a new interval, so gaps
    * in a key's history are represented, not papered over. Ties on the
    * timestamp resolve by `seqCol` (same deterministic total order as
    * compaction), which may yield zero-length superseded intervals —
    * the faithful reading of same-instant rewrites.
    *
    * Shape at scale: ONE keyed window (lead over the per-key exchange)
    * + a filter; no join, no self-union, per-key history length
    * irrelevant — identical exchange profile to any keyed dedup. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           seqCol: String, opCol: String,
           valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(seqCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= "delete")
      .select(col(keyCol) +: col(seqCol) +: col(tsCol).as("valid_from") +:
        col("valid_to") +: col("valid_to").isNull.as("is_current") +:
        valueCols.map(col): _*)
  }

  /** The gate instance of [[scd2]] over the events changelog (same
    * tombstone mapping as [[cdcCompact]]): the full per-user version
    * history with validity intervals. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .withColumn("op",
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("upsert")))
    scd2(e, "user_id", "ts", "event_id", "op", Seq("event_type", "value"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** AS-OF (time-travel) lookup over an [[scd2]] history: the version
    * of every key that was active at instant `t` — `valid_from <= t`
    * and (`valid_to > t` or still current). Intervals partition each
    * key's timeline, so this yields AT MOST one row per key (a
    * zero-length superseded interval from a same-instant rewrite can
    * contain no t, by the half-open convention); a key deleted before
    * t and not yet re-inserted yields none. Duality, spec-pinned:
    * asOf(history, t) == compactChangelog of the changes with ts <= t.
    * Shape at scale: a pure filter over the history — with the history
    * persisted, time travel never touches the changelog. */
  def scd2AsOf(history: DataFrame, t: Column): DataFrame =
    history.filter(col("valid_from") <= t &&
      (col("valid_to") > t || col("valid_to").isNull))

  /** POINT-IN-TIME JOIN — the per-row generalization of [[scd2AsOf]]
    * and the feature-store primitive that prevents label leakage: each
    * fact row joins the dimension version that was active AT ITS OWN
    * timestamp (`valid_from <= fact_ts < valid_to`, open end = still
    * current). At most one dimension row matches per fact (intervals
    * partition each key's timeline); facts whose key was deleted or
    * not yet inserted at their ts survive with NULL dimension columns
    * (left join — dropping them silently would bias a training set).
    *
    * Shape at scale: an EQUI join on the key with the interval
    * predicate as a join-level filter — one co-partitioned exchange
    * pair, no range-join explosion, because per-key version counts are
    * bounded by change frequency, not fact volume. `prefix` namespaces
    * the dimension's payload columns so fact names never collide. */
  def pointInTimeJoin(facts: DataFrame, factKey: String, factTs: String,
                      history: DataFrame, histKey: String,
                      prefix: String = "dim_"): DataFrame = {
    val metaCols = Set(histKey, "valid_from", "valid_to", "is_current")
    val payload = history.columns.filterNot(metaCols.contains)
    val outDim = (Seq("valid_from", "valid_to") ++ payload)
      .map(prefix + _) :+ "_pit_key"
    val clash = facts.columns.toSet.intersect(outDim.toSet)
    require(clash.isEmpty,
      s"pointInTimeJoin: fact columns ${clash.mkString(", ")} collide with " +
        s"prefixed dimension output — pick a different prefix")
    val dim = history.select(
      col(histKey).as("_pit_key") +:
        col("valid_from").as(s"${prefix}valid_from") +:
        col("valid_to").as(s"${prefix}valid_to") +:
        payload.map(c => col(c).as(s"$prefix$c")): _*)
    facts.join(dim,
        facts(factKey) === dim("_pit_key") &&
          col(s"${prefix}valid_from") <= facts(factTs) &&
          (col(s"${prefix}valid_to") > facts(factTs) ||
            col(s"${prefix}valid_to").isNull),
        "left_outer")
      .drop("_pit_key")
  }

  /** The gate instance of [[compactChangelog]] over the events table:
    * each event is a change record for its user — 'error' is the
    * tombstone, everything else upserts (event_type, value). */
  def cdcCompact(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .withColumn("op",
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("upsert")))
    compactChangelog(e, "user_id", "ts", "event_id", "op",
        Seq("event_type", "value"))
      .orderBy(col("user_id"))
  }

  /** ROLLING AGGREGATE — per-type daily totals with a 7-day trailing
    * moving average, over a GAP-FILLED day axis (a missing day is a
    * zero-revenue day; without the dense grid, ROWS BETWEEN 6 PRECEDING
    * silently reaches back further than a week — the classic rolling-
    * metric bug). Composes the gap-fill shape with a RANGE-equivalent
    * rows frame.
    *
    * Determinism: daily totals are exact DECIMAL sums; the average is
    * (decimal-exact window sum) cast to double / row count — one IEEE
    * division per row, no accumulation-order surface. */
  def dailyMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val bucketed = e.select(col("event_type"), to_date(col("ts")).as("day"),
      col("value").cast("decimal(14,2)").as("v"))
    // checkpointed for the same two-reference reason as gapFilledCounts
    val totals = bucketed.groupBy(col("event_type"), col("day"))
      .agg(sum(col("v")).as("total")).localCheckpoint()
    val grid = bucketed.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 DAY"))).as("day"))
      // type set from the aggregated totals — see gapFilledCounts
      .crossJoin(totals.select(col("event_type")).distinct())
    val dense = grid.join(totals, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("total"), lit(0).cast("decimal(14,2)")).as("total"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    dense
      .withColumn("ma7",
        round(sum(col("total")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double"), 6))
      .select(col("event_type"), col("day"),
        col("total").cast("double").as("total"), col("ma7"))
      .orderBy(col("event_type"), col("day"))
  }

  /** ROBUST OUTLIER DETECTION — flag events whose value deviates from
    * its event_type's MEDIAN by more than `nMads` × the median absolute
    * deviation. Median/MAD are the robust location/scale pair: a mean/
    * stdev z-score moves with the outliers it's hunting (one huge value
    * inflates σ and hides its peers); the median pair doesn't break
    * until half the data is bad.
    *
    * Shape at scale: two keyed exact-percentile aggregations (type
    * cardinality is tiny, so each is one map-side-combined shuffle of
    * per-type partials) with the per-type medians/MADs pulled back onto
    * the stream by BROADCAST joins — the event log itself never
    * shuffles. Medians snap to 6dp so the cross-engine interpolation
    * arithmetic can't wobble the flag set. */
  def madOutliers(spark: SparkSession, sfDir: String,
                  nMads: Double = 3.0): DataFrame =
    madOutliersOf(Tables.events(spark, sfDir), nMads)

  /** DataFrame core of [[madOutliers]] — expects
    * (event_id, event_type, value). */
  def madOutliersOf(events: DataFrame, nMads: Double): DataFrame = {
    val e = events.select(col("event_id"), col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(nMads) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"))
      .orderBy(col("event_id"))
  }

  /** ORDERED EVENT FUNNEL — how many users progressed view → click →
    * purchase, each step strictly after the previous one (the product-
    * analytics sequence query; funnels are the canonical "needs
    * per-entity event ORDER" aggregation a plain groupBy can't see).
    *
    * Per user the step times form a chain of conditional minima:
    * t1 = min ts of a 'view'; t2 = min ts of a 'click' with ts > t1;
    * t3 = min ts of a 'purchase' with ts > t2. Each tN is a per-user
    * CONSTANT, so the chain is three whole-partition window minima
    * over the SAME partitioning — Spark plans ONE exchange+sort on
    * user_id and evaluates the three Window operators back to back
    * (no per-step self-join, no re-shuffle; at 100 TB the cost is one
    * keyed sort of the event log). The final 3-row rollup is a tiny
    * conditional count over the per-user distinct (t1,t2,t3). */
  def funnel(spark: SparkSession, sfDir: String,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnelOf(Tables.events(spark, sfDir), steps)

  /** DataFrame core of [[funnel]] — expects (user_id, event_type, ts). */
  def funnelOf(e: DataFrame, steps: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val withTs = steps.zipWithIndex.foldLeft(e) { case (df, (step, i)) =>
      val prev = if (i == 0) lit(true) else col(s"t$i").isNotNull && col("ts") > col(s"t$i")
      df.withColumn(s"t${i + 1}",
        min(when(col("event_type") === step && prev, col("ts"))).over(w))
    }
    val perUser = withTs
      .select(col("user_id") +: steps.indices.map(i => col(s"t${i + 1}")): _*)
      .distinct()
    // one aggregation row carries every step's count; the 3-row output
    // is an explode over that single row (one scan, not one per step)
    val counts = perUser.agg(
      steps.indices.map(i =>
        sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)).as(s"s${i + 1}")).head,
      steps.indices.tail.map(i =>
        sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)).as(s"s${i + 1}")): _*)
    counts
      .select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i + 1).as("step"), lit(step).as("step_name"),
          col(s"s${i + 1}").as("users"))
      }: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.users"))
      .orderBy(col("step"))
  }

  /** COHORT RETENTION — for each acquisition cohort (a user's first
    * active DAY), how many of its users were active again N days
    * later. The standard growth-analytics triangle; "activity" is any
    * event on that calendar day.
    *
    * Shape at scale: ONE keyed aggregation collapses the event log to
    * per-user (first day, distinct active-day set) — the set is
    * bounded by the calendar span (≤366/user/year), not the event
    * count, and collect_set combines map-side — then an explode +
    * re-key by (cohort, offset) aggregates the triangle, whose size is
    * span², data-independent. The event log is scanned and shuffled
    * exactly once. */
  def retention(spark: SparkSession, sfDir: String): DataFrame =
    retentionOf(Tables.events(spark, sfDir))

  /** DataFrame core of [[retention]] — expects (user_id, ts). */
  def retentionOf(e: DataFrame): DataFrame = {
    val perUser = e.select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"),
        collect_set(col("day")).as("days"))
    perUser
      .select(col("user_id"), col("cohort_day"),
        explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Per-GROUP [[exactQuantiles]] — the per-domain cutoff primitive
    * (p99 doc length per language, price bands per segment) with the
    * same bounded-memory contract: pass 1 is ONE aggregation producing
    * per-group stats and the per-(group, bin) histogram; the
    * per-group selection then runs as ONE fused job over the target
    * (group, bin) cells. Group cardinality is assumed BOUNDED (domains,
    * languages, flags — the driver holds G stats rows and G·|ps|
    * selection targets); unbounded-key quantiles belong to the
    * single-reducer `percentile` per group (q16), which shuffles by
    * key instead. Returns (group, p, value) in group-then-ps order. */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
                            valueCol: String, ps: Seq[Double],
                            buckets: Int = 1000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
      .localCheckpoint() // pass 2 probes must not recompute upstream
    val stats = rows.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // per-row bin under its own group's extent (broadcast stats join)
    val statsDf = stats.toSeq.map { case (g, (lo, hi, _)) => (g, lo, hi) }
      .toDF("g", "_lo", "_hi")
    val binned = rows.join(broadcast(statsDf), "g")
      .withColumn("bin", when(col("_hi") === col("_lo"), lit(0L))
        .otherwise(least(
          floor((col("v") - col("_lo")) /
            ((col("_hi") - col("_lo")) / buckets)),
          lit(buckets - 1L)).cast("long")))
    val hist = binned.groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // FUSED pass 2 (round 17): the old form scheduled one filtered
    // TakeOrdered job per (group, quantile) — G·|ps| scans of the binned
    // relation (each re-paying the broadcast stats join). All targets
    // now share ONE job: semi-filter to the target (g, bin) cells, rank
    // each cell ascending, pick each target's offset-th smallest (the
    // same multiset order statistic "max of the first `offset` ordered
    // values" computed; tie order cannot change it). Memory contract
    // unchanged — one cell's ~n/B rows sort in one spillable task.
    val gs = stats.keys.toSeq.sorted
    val targets = gs.flatMap { g =>
      val (lo, hi, n) = stats(g)
      if (hi == lo) Nil
      else {
        val cum = (0L until buckets.toLong).scanLeft(0L) {
          (acc, b) => acc + hist.getOrElse((g, b), 0L)
        }
        ps.map { p =>
          val r = math.ceil(p * n).toLong.max(1L)
          val b = (0L until buckets.toLong).find(b => cum((b + 1).toInt) >= r).get
          (g, p, b, (r - cum(b.toInt)).toInt)
        }
      }
    }
    val fused: Map[(String, Double), Double] =
      if (targets.isEmpty) Map.empty
      else {
        val keyDf = broadcast(
          targets.map(t => (t._1, t._3)).distinct.toDF("g", "bin"))
        val tDf = broadcast(targets.toDF("_tg", "p", "_tb", "_off"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g"), col("bin")).orderBy(col("v"))
        binned.join(keyDf, Seq("g", "bin"), "left_semi")
          .withColumn("_rn", row_number().over(w))
          .join(tDf, col("g") === col("_tg") && col("bin") === col("_tb") &&
            col("_rn") === col("_off"))
          .select(col("g"), col("p"), col("v")).collect()
          .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      }
    val picks = gs.flatMap { g =>
      val (lo, hi, _) = stats(g)
      ps.map(p => (g, p, if (hi == lo) lo else fused((g, p))))
    }
    picks.toDF("g", "p", "value")
  }

  /** EXACT order statistics at scale via two-pass histogram selection —
    * the quantile a single-reducer `percentile` agg (q16) answers by
    * materializing every value in one executor, answered instead with
    * bounded memory everywhere:
    *
    *   pass 1: one aggregation → (min, max, n) + a `buckets`-bin
    *           equi-width histogram (map-side combined; B counts on
    *           the driver, B chosen so n/B rows fit one task);
    *   select: for each p, rank r = ceil(p·n) (1-based, ascending —
    *           the "smallest value with ≥ r values ≤ it" discrete
    *           quantile); the cumulative histogram names the ONE
    *           bucket holding rank r and the in-bucket offset;
    *   pass 2: ONE fused job over all target buckets (the same floor
    *           expression that binned pass 1, so boundary rounding
    *           cannot disagree): rank each target bin ascending and
    *           keep each target's offset-th smallest value. The job
    *           touches ~|ps|·n/B rows, one spillable sort per bin.
    *
    * A production layout would persist the bin as a partition/layout
    * column so pass 2 prunes at file level; on raw parquet the filter
    * is still a codegen'd scan, never a global sort. Degenerate width
    * (all values equal) short-circuits to that value. Returns (p,
    * value) rows in `ps` order.
    *
    * SKEW NOTE (ADVICE r17): pass 2 ranks each target bin in one
    * window task, so its memory/latency contract is "one bin's rows
    * sort in one spillable task" — with equi-width bins, a heavy-tailed
    * distribution whose extent is stretched by outliers can land most
    * of n in ONE bin, turning that task into a near-full sort (correct,
    * spills, slow). Raise `buckets` so n/B stays task-sized on such
    * data; the old per-p TakeOrdered path had the same single-bin scan
    * cost but a bounded heap, so extreme skew favors more buckets, not
    * a different algorithm. */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                     buckets: Int = 1000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    // checkpointed like the per-group twin: the extent agg, histogram
    // and every pass-2 probe re-read this relation — pass 2 must not
    // recompute an expensive (or non-deterministic) upstream per p
    val rows = df.select(v.as("v")).filter(col("v").isNotNull)
      .localCheckpoint()
    val s = rows.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    val n = s.getLong(2)
    // empty input: min/max are null — check the count BEFORE unboxing them
    if (n == 0L) return Seq.empty[(Double, Double)].toDF("p", "value")
    val (lo, hi) = (s.getDouble(0), s.getDouble(1))
    val width = (hi - lo) / buckets
    if (width == 0d)
      return ps.map(p => (p, lo)).toDF("p", "value")
    val binExpr = least(floor((col("v") - lit(lo)) / lit(width)),
      lit(buckets - 1L)).cast("long")
    val hist = rows.groupBy(binExpr.as("bin")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cum = (0L until buckets.toLong).scanLeft(0L) {
      (acc, b) => acc + hist.getOrElse(b, 0L)
    } // cum(b) = rows in bins < b
    val targets = ps.map { p =>
      val r = math.ceil(p * n).toLong.max(1L)
      val b = (0L until buckets.toLong).find(b => cum((b + 1).toInt) >= r).get
      (p, b, (r - cum(b.toInt)).toInt) // rank within bin b, 1-based
    }
    // FUSED pass 2 (round 17): the old form ran one filtered TakeOrdered
    // job per quantile — |ps| separate scans of the checkpointed
    // relation. All selections now share ONE job: scan only the target
    // bins, rank each bin ascending, keep each target's offset-th
    // smallest value. Identical to "max of the first `offset` ordered
    // values": the offset-th smallest of a bin is a multiset order
    // statistic, so tie order cannot change it. Memory contract
    // unchanged — one bin's ~n/B rows sort in one (spillable) task.
    val bins = targets.map(_._2).distinct
    val tDf = broadcast(targets.toDF("p", "_tb", "_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bin")).orderBy(col("v"))
    val picked = rows.withColumn("_bin", binExpr)
      .filter(col("_bin").isin(bins: _*))
      .withColumn("_rn", row_number().over(w))
      .join(tDf, col("_bin") === col("_tb") && col("_rn") === col("_off"))
      .select(col("p"), col("v")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    ps.map(p => (p, picked(p))).toDF("p", "value")
  }

  /** ONE-PASS approximate quantiles by deterministic bottom-k sampling:
    * rank rows by the portable md5-uniform of a unique row key, keep
    * the k smallest — a uniform (but fully deterministic and
    * engine-portable) row sample computed as a single TakeOrdered pass
    * (per-partition top-k, no global sort, no second scan) — then
    * report the sample's exact quantiles (rank ⌈p·n⌉ over the sorted
    * sample, ties broken by the hash).
    *
    * The single-scan complement to the two-pass [[exactQuantiles]] at
    * 100 TB: error is the sampling error (~1/√k on the rank scale),
    * and the sample is MERGEABLE — union per-partition/per-day bottom-k
    * samples and re-truncate to k, because "k smallest hashes of the
    * union" = "k smallest of the merged k-smallest sets" (the KMV
    * coordination-free merge argument applied to row sampling). */
  def sampleQuantiles(df: DataFrame, valueCol: String, rowKey: Column,
                      ps: Seq[Double], k: Int,
                      salt: String = "sq"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "quantiles must lie in (0, 1]")
    require(k >= 1, s"sample size must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val u = graft.functions.PortableHash.md5Uniform(
      concat(rowKey.cast("string"), lit(salt)))
    val samp = df
      .select(col(valueCol).cast("double").as("v"), u.as("u"))
      .filter(col("v").isNotNull)
      .orderBy(col("u"), col("v"))
      .limit(k)
    // the sample is tiny (<= k rows): empty-frame windows are fine here
    val ranked = samp.select(col("v"), col("u"),
      row_number().over(Window.orderBy(col("v"), col("u"))).as("rn"),
      count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("n"))
    ranked.crossJoin(ps.toDF("p"))
      .filter(col("rn") ===
        greatest(ceil(col("p") * col("n")).cast("long"), lit(1L)))
      .select(col("p"), col("v").as("value"))
      .orderBy(col("p"))
  }

  /** Per-group [[sampleQuantiles]]: one shuffle keyed by group, then a
    * per-group bottom-k window cut (rank by the portable md5-uniform of
    * the row key INSIDE each group) and exact quantiles of each group's
    * sample. ONE pass over the data regardless of group count — unlike
    * [[exactQuantilesByGroup]] there is no bounded-cardinality
    * assumption and no per-(group, p) second-pass job: memory is k rows
    * per group at the window, and the merge property holds per group
    * (union, re-rank, truncate). The per-domain quantile primitive for
    * unbounded domain counts at 100 TB. */
  def sampleQuantilesByGroup(df: DataFrame, groupCol: String,
                             valueCol: String, rowKey: Column,
                             ps: Seq[Double], k: Int,
                             salt: String = "sq"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "quantiles must lie in (0, 1]")
    require(k >= 1, s"sample size must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val u = graft.functions.PortableHash.md5Uniform(
      concat(rowKey.cast("string"), lit(salt)))
    val rows = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"), u.as("u"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val samp = rows
      .withColumn("hrn",
        row_number().over(Window.partitionBy(col("g"))
          .orderBy(col("u"), col("v"))))
      .filter(col("hrn") <= k)
    val gw = Window.partitionBy(col("g"))
    val ranked = samp.select(col("g"), col("v"), col("u"),
      row_number().over(gw.orderBy(col("v"), col("u"))).as("rn"),
      count(lit(1)).over(
        gw.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("n"))
    ranked.crossJoin(ps.toDF("p"))
      .filter(col("rn") ===
        greatest(ceil(col("p") * col("n")).cast("long"), lit(1L)))
      .select(col("g"), col("p"), col("v").as("value"))
      .orderBy(col("g"), col("p"))
  }

  /** EQUI-DEPTH BINNING at scale (distributed NTILE / equi-height
    * histogram without a global sort): the B−1 bucket boundaries are
    * the i/B-quantiles of the deterministic bottom-k sample
    * ([[sampleQuantiles]] — one TakeOrdered scan), collected as a
    * bounded (B−1)-value sidecar and broadcast as a literal array;
    * every row is then assigned `bucket = 1 + #{cuts < v}` by a
    * codegen'd filter-size over that literal, so the full-data pass is
    * ONE scan feeding an aggregation keyed by ≤ B values. Ties on a
    * boundary go to the LOWER bucket (the NTILE reading where the cut
    * value closes its bucket); duplicate cut values leave the skipped
    * bucket empty rather than double-assigning.
    *
    * Emits per-bucket count/min/max — the equi-height histogram /
    * stratification primitive (optimizer statistics, monotone feature
    * binning, length-bucketed batch packing). Bucket populations are
    * within sampling error (~n/√k per boundary) of n/B, NOT exact —
    * the price of one-pass at 100 TB; [[exactQuantiles]]' two-pass
    * path supplies exact ranks when they matter. */
  def equiDepthBins(df: DataFrame, valueCol: String, rowKey: Column,
                    buckets: Int, k: Int,
                    salt: String = "sq"): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    // bounded sidecar: B-1 cut values from the deterministic sample
    val cuts = sampleQuantiles(df, valueCol, rowKey, ps, k, salt)
      .orderBy(col("p")).collect().map(_.getDouble(1))
    val v = col(valueCol).cast("double")
    if (cuts.isEmpty) { // empty input: no sample rows -> no bins
      return df.sparkSession.emptyDataFrame
        .select(lit(1).as("bucket"), lit(0L).as("n"),
          lit(0d).as("lo"), lit(0d).as("hi"))
    }
    val cutLit = array(cuts.map(lit(_)).toSeq: _*)
    df.filter(v.isNotNull)
      .groupBy((lit(1) + size(filter(cutLit, c => v > c))).as("bucket"))
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"))
      .orderBy(col("bucket"))
  }
}
