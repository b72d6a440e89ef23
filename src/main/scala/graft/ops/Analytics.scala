package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** OLAP headliners proving the engine is a real analytics engine on the
  * TPC-H-ish tables (scan-heavy agg, multi-way joins, windows).
  *
  * Float parity with the DuckDB oracle: money math runs in exact decimal
  * end-to-end (cast the 2-dp source doubles to decimal, multiply/sum in
  * decimal — exact and associative, so Spark's partial/final aggregation
  * order can't change the result), cast back to double only at the end.
  */
object Analytics {

  /** Exact-sum of a double expression: decimal-fold then back to double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(28,8)")).cast("double")

  /** Exact average: decimal sum divided by count in double (deterministic). */
  def davg(c: Column): Column = dsum(c) / count(lit(1)).cast("double")

  /** Money columns as exact decimals. Casting the raw 2-dp doubles is
    * unambiguous (the double sits ~1e-13 from the decimal value); all
    * onward arithmetic (multiply/subtract/sum) is exact decimal, so Spark
    * and the oracle agree bit-for-bit after the final cast to double.
    * Doing the *product* in double first and casting after is NOT safe —
    * the two engines' double→decimal rounding can differ by 1 ulp.
    */
  def money(c: Column): Column = c.cast("decimal(12,2)")
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  /** revenue expression: extendedprice * (1 - discount), exact decimal. */
  private def revenueExpr: Column =
    money(col("l_extendedprice")) * (lit(1).cast("decimal(4,2)") - rate(col("l_discount")))

  /** TPC-H Q1 pattern: one scan, wide aggregate. Map-side partial agg means
    * the shuffle carries |groups| rows per partition, not the table.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2001-06-30").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(revenueExpr).cast("double").as("sum_disc_price"),
        sum(revenueExpr * (lit(1).cast("decimal(4,2)") + rate(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        (sum(money(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(rate(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 pattern: customer ⋈ orders ⋈ lineitem, revenue top-k.
    * Customer is fact-scale (sf100 ≈ 15M rows) so it is NOT hint-broadcast:
    * AQE / autoBroadcastJoinThreshold picks broadcast when the filtered
    * side is actually small and falls back to a shuffle join when it isn't
    * — a hard-coded hint would OOM the driver at 100×. orders⋈lineitem
    * shuffles on the order key; top-10 is TakeOrdered (no global sort).
    */
  def topRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenueExpr).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 pattern: 6-way star join. True dimensions (region, nation —
    * fixed 5/25 rows at ANY scale factor) broadcast; customer and supplier
    * grow with the scale factor so they carry no hint — AQE broadcasts
    * them while they fit and shuffle-joins beyond that. Only
    * orders⋈lineitem is an unavoidable fact-fact shuffle.
    */
  def regionRevenue(spark: SparkSession, dir: String, regionName: String = "ASIA"): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === regionName)
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenueExpr).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6 pattern: pure filter + scalar aggregate — the pushdown
    * showcase (every predicate reaches the parquet scan).
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
        .cast("double").as("revenue"))

  /** TPC-H Q4 pattern: EXISTS as a LEFT SEMI join (no row multiplication,
    * build side only carries the key).
    */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    // EXISTS (any lineitem for the order) — semi-join keeps order rows
    // unique regardless of line multiplicity
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
    ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q18 pattern: HAVING over a grouped sum, join the survivors
    * back to their order header. The having-filter runs before the join,
    * so only qualifying keys shuffle.
    */
  def largeOrders(spark: SparkSession, dir: String, minQty: Double = 300.0): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q17 pattern: correlated scalar subquery (per-part average
    * quantity) DECORRELATED into one aggregate + equi-join — the only
    * form that scales (the naive correlated subquery re-scans lineitem
    * per part; Spark's decorrelation handles the SQL spelling, this is
    * the same plan stated directly).
    */
  def smallQtyRevenue(spark: SparkSession, dir: String, brand: String = "Brand#1"): DataFrame = {
    // no broadcast hint: part grows with the scale factor — AQE picks
    // broadcast while the brand-filtered side fits and shuffles beyond.
    // The per-part average is a WINDOW over the brand-joined rows, not a
    // groupBy+join-back: one shuffle on l_partkey instead of two, and the
    // average computes only for the 1/|brands| of lineitem that survives
    // the join (every lineitem of a surviving part is present, so the
    // window average equals the full per-part average).
    val parts = Tables.part(spark, dir).filter(col("p_brand") === brand)
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", sum(col("l_quantity").cast("decimal(28,8)")).over(w)
        .cast("double") / count(lit(1)).over(w).cast("double"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(money(col("l_extendedprice"))).cast("double") / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q22 pattern: scalar-aggregate threshold (broadcast single-row
    * cross join — no shuffle) + LEFT ANTI join against recent orders,
    * then a per-nation rollup of the recently-idle high-balance
    * customers. The anti-join's build side carries only the filtered
    * custkeys.
    */
  def idleCustomerBalances(spark: SparkSession, dir: String,
                           sinceDate: String = "1999-01-01"): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(sinceDate).cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q7 pattern: bidirectional nation-pair trade volume by year.
    * The nation dimension is filtered to the TWO named nations BEFORE its
    * broadcast joins (the pushable half of the pair predicate — it shrinks
    * both join fans 25/2×); the cross-side OR (supp=n1 ∧ cust=n2 ∨ vice
    * versa), which no single-side filter can express, runs after. Both
    * nation joins broadcast: the dimension is 25 rows at any scale factor.
    */
  def nationVolume(spark: SparkSession, dir: String,
                   n1: String = "NATION_13", n2: String = "NATION_19"): DataFrame = {
    val nation = Tables.nation(spark, dir)
      .filter(col("n_name").isin(n1, n2)).select(col("n_nationkey"), col("n_name"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
      .join(broadcast(nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revenueExpr).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q10 pattern: lost revenue from returned items per customer,
    * top-20. Time-filtered orders and the R-flag filter both reach their
    * scans; the nation join broadcasts; top-20 is TakeOrdered.
    */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenueExpr).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 pattern: conditional aggregation — CASE WHEN inside the
    * sums, one pass over the join, no per-branch subqueries.
    */
  def priorityShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q14 pattern: promo revenue share — two conditional decimal sums
    * and one division, a single scan+join pass. Nulls from the unmatched
    * WHEN branch vanish in the sum on both engines.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
    li.join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", revenueExpr)).cast("double") /
        sum(revenueExpr).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q8 pattern: a nation's market share inside a region = the
    * conditional-sum ratio per year over the widest join in the suite
    * (lineitem ⋈ part ⋈ orders ⋈ customer ⋈ supplier + two nation lookups
    * + region). Fixed dimensions (nation, region) broadcast; the p_type
    * and date filters reach their scans; both ratio legs come out of ONE
    * aggregation pass (no per-leg subqueries).
    */
  def marketShare(spark: SparkSession, dir: String, nationName: String = "NATION_24",
                  regionName: String = "ASIA", ptype: String = "STANDARD"): DataFrame = {
    val custNation = broadcast(Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk")))
    val suppNation = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_type") === ptype),
        col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(custNation, col("c_nationkey") === col("c_nk"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === nationName, revenueExpr)).cast("double") /
        sum(revenueExpr).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q19 pattern: disjunctive multi-column predicates (OR of ANDs
    * spanning both join sides). The per-side halves push down — Catalyst
    * derives `p_brand IN (...)` / `p_size <= 50` / `l_quantity >= 10` from
    * the disjunction and sends them to the scans — while the full
    * cross-side OR evaluates after the join. One join, one scalar agg.
    */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity") >= 10) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) && col("l_quantity") >= 20) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) && col("l_quantity") >= 30)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(sum(revenueExpr).cast("double").as("revenue"))
  }

  /** TPC-H Q15 pattern: argmax join — the supplier(s) hitting the maximum
    * quarterly revenue. The grouped revenue is computed ONCE; the scalar
    * max broadcasts back over it (single-row cross join, no second scan of
    * lineitem); ties all surface, exactly like the SQL `= (SELECT max …)`
    * form. The equality compares exact decimals — comparing re-rounded
    * doubles would be engine-dependent.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-10-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenueExpr).as("r"))
    rev.crossJoin(broadcast(rev.agg(max(col("r")).as("mx"))))
      .filter(col("r") === col("mx"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("r").cast("double").as("total_rev"))
      .orderBy("s_suppkey")
  }

  /** Rollup: hierarchical subtotals in one pass (grand total + per-group),
    * Spark's GROUPING SETS machinery.
    */
  def eventRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .rollup(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)

  /** Exact distinct cardinalities — the shuffle-dedup aggregate class.
    * (HLL `approx_count_distinct` is the scale path; its sketch values are
    * engine-specific so the oracle-checked query uses the exact form.)
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Pivot: one column per event type, counts per user. Explicit value
    * list keeps the plan a single pass (no distinct-values pre-query).
    */
  def eventPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy("user_id")
  }

  /** Window pattern: top-k orders per customer by rank. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Frame-based window functions: per-session event gaps (lag) and a
    * 5-row rolling average (ROWS frame) in ONE window pass — the
    * event-sequence feature-engineering shape. The rolling sum runs in
    * decimal (frame-order fp addition is engine/algorithm-specific;
    * decimal is exact, so Spark's sliding-frame incremental sum and the
    * oracle's agree bit-for-bit). One shuffle on user_id serves both
    * functions; within-partition sort is the only other cost.
    */
  def rollingUserStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      graft.model.Documents.tsSec(col("ts")).as("ts_sec"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val frame = w.rowsBetween(-4, 0)
    ev.select(
      col("event_id"), col("user_id"), col("ts_sec"),
      (col("ts_sec") - lag(col("ts_sec"), 1).over(w)).as("gap_sec"),
      (sum(col("value").cast("decimal(18,4)")).over(frame).cast("double") /
        count(lit(1)).over(frame)).as("roll_avg"))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
  }

  /** CUBE: all 2^k grouping-set subtotals in one pass (ROLLUP's lattice
    * sibling — #28c covers the hierarchy form). Spark expands grouping
    * sets map-side, so the shuffle carries one partial row per (set ×
    * group), not one pass per set.
    */
  def eventCube(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .cube(col("event_type"), (col("user_id") % 4).as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first, col("bucket").asc_nulls_first)

  /** TPC-H Q13 pattern: LEFT OUTER join + two-level aggregation — the
    * orders-per-customer distribution (customers with zero orders must
    * survive, hence outer). The outer join shuffles on the key; the second
    * aggregate's input is |customers| rows, already tiny. At scale the
    * first groupBy and the join share the o_custkey partitioning, so AQE
    * plans one exchange for both.
    */
  def orderCountDistribution(spark: SparkSession, dir: String,
                             excludePriority: String = "5-LOW"): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= excludePriority)
      .select("o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val perCust = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count")) // count(col) skips NULLs → 0 for orderless
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q9 pattern: LIKE-filtered multi-join profit rollup by nation ×
    * order-year. The p_name LIKE predicate is pushed to the part scan
    * (substring pushdown ≙ #28j); part and the two dimensions broadcast;
    * lineitem never shuffles before the final groupBy. (The reference
    * Q9 uses ps_supplycost; there is no partsupp table in this corpus, so
    * profit = discounted revenue less a fixed 90%-of-retail cost proxy —
    * the join/derive/group shape is the point.)
    */
  def partProfit(spark: SparkSession, dir: String, namePart: String = "widget"): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").contains(namePart))
      .select(col("p_partkey"), money(col("p_retailprice")).as("p_cost"))
    val li = Tables.lineitem(spark, dir)
    val profit = revenueExpr -
      (lit("0.9").cast("decimal(4,2)") * col("p_cost")) * col("l_quantity").cast("decimal(12,2)")
    li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q16 pattern: grouped DISTINCT count with a NOT-IN exclusion
    * (spelled LEFT ANTI — the only NOT-IN form that scales; Spark's
    * null-aware anti join degrades to broadcast-nested-loop when the
    * subquery column is nullable). Suppliers in deficit are excluded from
    * the variety count per (brand, type, size-bucket).
    */
  def supplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("bad_suppkey"))
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(bad), col("l_suppkey") === col("bad_suppkey"), "left_anti")
    li.join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), (col("p_size") % 10).as("size_mod"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("size_mod"))
  }

  /** TPC-H Q11 pattern: grouped totals kept only where they exceed a
    * FRACTION OF THE GLOBAL total — the scalar-subquery-over-aggregate
    * HAVING. The global total is one row, broadcast into a cross join
    * (no shuffle); only groups above the bar survive. Positive balances
    * only, so the threshold is well-defined.
    */
  def nationConcentration(spark: SparkSession, dir: String,
                          fraction: Double = 0.05): DataFrame = {
    val pos = Tables.supplier(spark, dir).filter(col("s_acctbal") > 0.0)
    val global = pos.agg(sum(money(col("s_acctbal"))).as("total_bal"))
    pos.groupBy(col("s_nationkey"))
      .agg(sum(money(col("s_acctbal"))).as("nation_bal"))
      .crossJoin(broadcast(global))
      .filter(col("nation_bal") > lit(fraction).cast("decimal(12,6)") * col("total_bal"))
      .select(col("s_nationkey"), col("nation_bal").cast("double").as("nation_bal"))
      .orderBy(col("nation_bal").desc, col("s_nationkey"))
  }

  /** TPC-H Q2 pattern: correlated min-over-group subquery — the min-cost
    * supplier per part within a region — decorrelated into a grouped min
    * plus an equality join-back, the scalable spelling of
    * `WHERE cost = (SELECT min(cost) ... WHERE correlated)`. The catalog
    * has no partsupp table, so the offer relation derives from lineitem:
    * a (part, supplier) pair's unit cost is its minimum observed
    * `l_extendedprice / l_quantity` (IEEE double division — bit-identical
    * in any engine, so the join-back on the double cost is exact).
    * Region suppliers and filtered parts prune the lineitem scan through
    * BROADCAST joins before the one real shuffle (the grouped min on
    * (partkey, suppkey)); the per-part best and the supplier dim join
    * back as broadcasts too, so a 100 TB lineitem costs exactly one
    * shuffle of its filtered slice. Ordered by account balance like the
    * original Q2 top-100 (s_name and p_partkey make the order total).
    */
  def minCostSupplier(spark: SparkSession, dir: String,
                      regionName: String = "ASIA"): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select("p_partkey")
    val offers = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 0.0)
      .join(broadcast(sup.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val best = offers.groupBy(col("l_partkey").as("bp"))
      .agg(min(col("unit_cost")).as("best_cost"))
    offers
      .join(broadcast(best), col("l_partkey") === col("bp") && col("unit_cost") === col("best_cost"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q20 pattern: the double-nested aggregate subquery — suppliers
    * whose shipped quantity of a name-filtered part set in one year
    * exceeds HALF their all-time quantity for the same (part, supplier)
    * pair (the catalog has no `ps_availqty`, so "excess stock" becomes
    * concentration in the target year — same nesting, same join chain).
    * Both the conditional year-sum and the total come out of ONE grouped
    * aggregate (no second lineitem scan, unlike the literal correlated
    * spelling), the ratio filter runs in exact decimal (`2*qty_yr >
    * qty_all` — no 0.5 rounding), and the survivors semi-join into the
    * region-filtered supplier dim. Shuffle cost: one grouped agg over
    * the part-filtered lineitem slice; everything else is broadcast.
    */
  def concentratedShippers(spark: SparkSession, dir: String,
                           namePrefix: String = "red ", yr: Int = 1997,
                           regionName: String = "EUROPE"): DataFrame = {
    val pk = Tables.part(spark, dir)
      .filter(col("p_name").startsWith(namePrefix))
      .select("p_partkey")
    val conc = Tables.lineitem(spark, dir)
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(
        sum(when(year(col("l_shipdate")) === yr, col("l_quantity"))
          .otherwise(0.0).cast("decimal(28,8)")).as("qty_yr"),
        sum(col("l_quantity").cast("decimal(28,8)")).as("qty_all"))
      .filter(col("qty_yr") * 2 > col("qty_all"))
      .select(col("l_suppkey"))
      .distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(conc), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** Sliding-window distinct count — 7-day rolling active users per day —
    * at event-log scale. `COUNT(DISTINCT user) OVER (RANGE 6 DAYS
    * PRECEDING)` has no scalable direct form (Spark rejects DISTINCT in
    * windows, and a naive self-join re-reads the log per day), so the
    * classic reshape: dedup to (user, active-day) rows first — the only
    * per-event work, one map-side-combined distinct — then each user-day
    * votes into the ≤`windowDays` window-ends it can influence via a
    * tiny sequence explode, and a grouped exact count-distinct finishes.
    * Shuffle is O(distinct user-days × windowDays), independent of raw
    * event volume: a power user costs one row per active day, not one
    * per event. Leading partial windows are kept (days 1..6 of the log
    * see shorter lookback, like the SQL form); window-ends past the last
    * log day are dropped.
    */
  def slidingActiveUsers(spark: SparkSession, dir: String,
                         windowDays: Int = 7): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val maxD = ud.agg(max(col("d")).as("max_d"))
    ud.select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"), col("d"))
      .select(col("user_id"), date_add(col("d"), col("off")).as("w_day"))
      .crossJoin(broadcast(maxD))
      .filter(col("w_day") <= col("max_d"))
      .groupBy(col("w_day"))
      .agg(countDistinct(col("user_id")).as("dau7"))
      .orderBy(col("w_day"))
  }

  /** First-order Markov transition matrix over each user's event stream:
    * lag() pairs consecutive event types per user (one exchange+sort on
    * user_id — the same shuffle every per-user window op shares), the
    * (prev → next) pairs reduce map-side into a |types|² matrix, and
    * row-normalized probabilities come from a window sum over that tiny
    * matrix — no second pass over the events. The probability is one
    * IEEE double division per cell, deterministic in any engine;
    * microsecond timestamps + event_id make the per-user order total.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Running distinct-count per user (how many distinct event types seen
    * so far, at every event): DISTINCT inside a running frame is
    * unsupported, and the collect_set folk version carries O(history)
    * state per row. The scalable reshape: flag the FIRST occurrence of
    * each (user, type) with a row_number over one window, then a running
    * sum of flags over the user timeline — per-row state is one long
    * regardless of history. Two exchanges total (the flag window keys by
    * (user, type), the timeline by user); at 100 TB both hash-partition
    * cleanly and neither collects anything driver-side.
    */
  def runningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    val timeline = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("first_seen",
        when(row_number().over(byType) === 1, 1L).otherwise(0L))
      .withColumn("distinct_so_far", sum(col("first_seen")).over(timeline))
      .select(col("event_id"), col("user_id"), col("distinct_so_far"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Gap-based batch sessionization — the canonical event-log →
    * session-table transform (the GA/Amplitude inactivity convention,
    * gap configurable): a user's session breaks when the silence since
    * their previous event exceeds `gapUs`; the session id is the running
    * count of breaks. The break flag (lag) and the running index
    * (cumulative sum) ride ONE window spec, so Catalyst plans both
    * Window operators over a single exchange+sort on `user_id` — one
    * shuffle of the event log, per-row state two longs at any history
    * length (no sessionizing UDAF, no per-user collect; the batch twin
    * of streaming.Sessionizer's timeout semantics). Per-session summary
    * is one further map-combinable groupBy.
    *
    * `ev` needs (event_id, user_id, event_type, ts_us). Returns one row
    * per (user_id, session_idx): event count, start/end/duration micros,
    * distinct event types.
    */
  def sessionize(ev: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs > 0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count_distinct(col("event_type")).as("n_types"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"), col("n_types"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** [[sessionize]] over the events table at the fixture's natural
    * inactivity scale (8 h — the sf gap distribution's knee; the
    * convention parameter, not a semantic).
    */
  def eventSessions(spark: SparkSession, dir: String,
                    gapUs: Long = 8L * 3600L * 1000000L): DataFrame =
    sessionize(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")), gapUs)

  /** Gini concentration coefficient over a positive value column — the
    * one-number "how concentrated is activity on power users / hot
    * keys" audit (also the skew signal that decides whether salting
    * matters on a key). Exact integer end-to-end: with values sorted
    * ascending x₍₁₎…x₍ₙ₎ (tie column makes the order total),
    * G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx), floored to micro. The global
    * rank is the range-partitioned [[Rank.withGlobalRank]] — no
    * single-task window at any n — and the three sums fold map-side;
    * rank·value products widen to decimal BEFORE multiplying (i·x
    * overflows int64 near 10⁹ rows × 10⁹ values), the DuckDB side
    * matching via HUGEINT. One row: (n, total, gini_micro); NULL on an
    * all-zero total rather than an engine-divergent division. `total`
    * ships as the decimal's STRING rendering (the ts_seasonal_strength
    * convention): a long cast would NULL past int64 under Spark's
    * non-ANSI decimal→long while DuckDB's BIGINT cast errors — exactly
    * the >int64 scales the decimal fold guards.
    */
  def gini(df: DataFrame, valueCol: Column, tieCol: Column): DataFrame = {
    val ranked = Rank.withGlobalRank(
      df.select(valueCol.cast("long").as("x"), tieCol.as("tie")),
      Seq(col("x"), col("tie")), rankCol = "i")
    ranked.agg(count(lit(1)).as("n"),
        // total folds in decimal too: at the same ~1e9×1e9 scales the
        // rank products guard against, sum(x) itself can pass 9.2e18 and
        // wrap silently as int64 while DuckDB folds in HUGEINT
        sum(col("x").cast("decimal(38,0)")).as("dtotal"),
        sum(col("i").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
          .as("six"))
      .select(col("n"), col("dtotal").cast("string").as("total"),
        when(col("dtotal") > 0L, expr(
          "(2 * six - (cast(n as decimal(19,0)) + 1) * dtotal) * 1000000" +
            " div (cast(n as decimal(19,0)) * dtotal)")).as("gini_micro"))
  }

  /** [[gini]] of events per user — the power-user concentration number
    * (0 = uniform, →1 = one user is the corpus).
    */
  def eventsGini(spark: SparkSession, dir: String): DataFrame =
    gini(Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("x")), col("x"), col("user_id"))

  /** Lorenz concentration curve — the table behind the [[gini]] number
    * (the "bottom 80% of users hold X‰ of the activity" readout): the
    * population in `buckets` ascending-value quantile bins (exact SQL
    * ntile via the range-partitioned [[Rank.rangedNtile]], no
    * single-task window), each bin's count and total, and the exact
    * cumulative share of the grand total in permille (cumulative via
    * [[Rank.withRunningSum]]; the product widens to decimal before the
    * divide; the grand total is a 1-row broadcast, plan-audit-bounded).
    */
  def lorenz(df: DataFrame, valueCol: Column, tieCol: Column,
             buckets: Int = 10): DataFrame = {
    val binned = Rank.rangedNtile(
      df.select(valueCol.cast("long").as("x"), tieCol.as("tie")),
      buckets, Seq(col("x"), col("tie")), out = "bucket")
    val agg = binned.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("bucket_total"))
    val tot = agg.agg(sum(col("bucket_total")).as("grand"))
    Rank.withRunningSum(agg, Seq(col("bucket")), "bucket_total", "cum_total")
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"), col("bucket_total"),
        expr("cast(cum_total as decimal(38,0)) * 1000 div grand")
          .as("cum_share_permille"))
      .orderBy(col("bucket"))
  }

  /** [[lorenz]] deciles of events per user. */
  def eventsLorenz(spark: SparkSession, dir: String): DataFrame =
    lorenz(Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("x")), col("x"), col("user_id"))

  /** Ordered-sequence funnel: how many users progress through the event
    * stages in ORDER (a later stage only counts if it happens strictly
    * after some completion of the previous one). The per-row "stage k
    * reached by now" times are chained running minimums over ONE window
    * spec — Catalyst plans the three dependent Window operators over a
    * single exchange+sort on `user_id`, so the whole funnel costs one
    * shuffle of the events plus a tiny per-user aggregate. No
    * sessionizing UDAF, no per-user collect: state per row is three
    * longs regardless of history length, which is what survives a
    * 100 TB event log (contrast the collect_list-per-user folk version,
    * which OOMs on power users). Timestamps compare at microsecond
    * precision so simultaneous-second events can't fake an ordering.
    */
  def funnelStages(spark: SparkSession, dir: String,
                   stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnel(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")), stages)

  /** DataFrame form of [[funnelStages]]: `ev` needs (event_id, user_id,
    * event_type, ts_us) columns. k-stage: one `reached_stageK` count per
    * configured stage.
    */
  def funnel(ev: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnelUsers(ev, stages).agg(
      count(lit(1)).as("users_total"),
      stages.indices.map(i => count(col(s"u${i + 1}")).as(s"reached_stage${i + 1}")): _*)

  /** Per-user stage-completion times (NULL = stage never reached in
    * order) — the funnel's intermediate, also the batch twin of the
    * streaming stage machine ([[graft.streaming.Funnel]]). Generalized
    * to ANY k ≥ 2 distinct stages: the chained running-min composition
    * folds mechanically (stage k's running min is gated on stage k−1's
    * running min at the same row), and every chained min rides ONE
    * window spec, so Catalyst plans the k dependent Window operators
    * over a single exchange+sort on `user_id` — per-row state stays k
    * longs at any history length.
    */
  def funnelUsers(ev: DataFrame,
                  stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = stages.zipWithIndex.foldLeft(ev) { case (df, (st, i)) =>
      val gate =
        if (i == 0) col("event_type") === st
        else col("event_type") === st && col("ts_us") > col(s"s$i")
      df.withColumn(s"s${i + 1}", min(when(gate, col("ts_us"))).over(w))
    }
    staged.groupBy(col("user_id"))
      .agg(min(col("s1")).as("u1"),
        stages.indices.drop(1).map(i => min(col(s"s${i + 1}")).as(s"u${i + 1}")): _*)
  }

  /** [[funnelUsers]] with a CONVERSION WINDOW — the funnel product
    * analytics actually ships (Amplitude/Mixpanel convention): a stage
    * counts only if it happens within `windowUs` of the most recent
    * completion of the PREVIOUS stage, and the anchor RE-ARMS on every
    * later previous-stage completion (a user who views, goes cold, and
    * views again converts off the second view — the first-touch-anchored
    * spelling would miss that conversion entirely). Semantics per row:
    * stage-k event converts iff the latest stage-(k−1) conversion so far
    * is strictly earlier and at most `windowUs` before it; `uk` is the
    * first such conversion time (NULL = never within window).
    *
    * Scale shape: exactly [[funnelUsers]]'s — the chained "latest
    * previous-stage conversion" running maxima all ride ONE window spec,
    * so Catalyst plans the dependent Window operators over a single
    * exchange+sort on `user_id`; state per row is three longs, no
    * per-user collect, no sessionizing UDAF.
    */
  def funnelUsersWindowed(ev: DataFrame, windowUs: Long,
                          stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct == stages, "funnel stages must be distinct")
    require(windowUs > 0)
    val k = stages.size
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // l_j = latest stage-j conversion so far (re-arming anchor);
    // c_j = this row's stage-j conversion time if it lands in-window.
    // The last stage needs no anchor column — nothing converts off it.
    var df = ev.withColumn("l1",
      max(when(col("event_type") === stages(0), col("ts_us"))).over(w))
    for (j <- 2 to k) {
      df = df.withColumn(s"c$j",
        when(col("event_type") === stages(j - 1) && col(s"l${j - 1}").isNotNull &&
          col("ts_us") > col(s"l${j - 1}") &&
          col("ts_us") - col(s"l${j - 1}") <= windowUs,
          col("ts_us")))
      if (j < k) df = df.withColumn(s"l$j", max(col(s"c$j")).over(w))
    }
    df.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === stages(0), col("ts_us"))).as("u1"),
        (2 to k).map(j => min(col(s"c$j")).as(s"u$j")): _*)
  }

  /** Windowed-funnel headline counts on the events table (24 h default
    * window — binding on this fixture: users' median inter-event gap is
    * ~11 h, so the window drops real conversions the unbounded funnel
    * keeps, which is the point).
    */
  def eventFunnelWindowed(spark: SparkSession, dir: String,
                          windowUs: Long = 86400000000L,
                          stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnelUsersWindowed(Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us")), windowUs, stages)
      .agg(count(lit(1)).as("users_total"),
        stages.indices.map(i =>
          count(col(s"u${i + 1}")).as(s"reached_stage${i + 1}")): _*)

  /** Funnel conversion-rate table over [[funnelUsers]] — the three
    * numbers a product review actually reads per stage: how many users
    * arrived, what fraction of the PREVIOUS stage converted, and the
    * exact median time-to-convert from the stage before. Rates are
    * truncating permille of exact counts; the median is the nearest-rank
    * LOWER median (`(n+1) div 2` over the total (delta, user_id) order —
    * no interpolation, no float) of the per-user stage deltas in micros.
    *
    * Scale shape: beyond [[funnelUsers]]'s own per-user window, the
    * epilogue is one explode to O(users · k) tagged rows, one grouped
    * agg, and one per-stage rank window — stage partitions are the
    * parallelism unit and the k-row result joins itself by broadcast.
    */
  def funnelRates(ev: DataFrame,
                  stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val su = funnelUsers(ev, stages).select(col("user_id"),
      explode(array(stages.indices.map { i =>
        val j = i + 1
        if (i == 0)
          struct(lit(1).as("stage"), col("u1").isNotNull.as("reached"),
            lit(null).cast("long").as("delta"))
        else
          struct(lit(j).as("stage"), col(s"u$j").isNotNull.as("reached"),
            when(col(s"u$j").isNotNull, col(s"u$j") - col(s"u${j - 1}"))
              .as("delta"))
      }: _*)).as("s"))
      .select(col("user_id"), col("s.stage").as("stage"),
        col("s.reached").as("reached"), col("s.delta").as("delta"))
    val agg = su.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("reached"), 1L).otherwise(0L)).as("reached"))
    val med = su.filter(col("delta").isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("stage")).orderBy(col("delta"), col("user_id"))))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("stage"))))
      .filter(col("rn") === expr("(nd + 1) div 2"))
      .select(col("stage"), col("delta").as("median_delta_us"))
    // lag runs directly over the k-row stage aggregate (BEFORE the median
    // join) so the global window provably rides a bounded table; the
    // lit(0) partition spells the same single partition WITHOUT the
    // per-execution WindowExec "No Partition Defined" warning
    agg.withColumn("prev_reached",
        lag(col("reached"), 1).over(Window.partitionBy(lit(0)).orderBy(col("stage"))))
      .join(broadcast(med), Seq("stage"), "left_outer")
      .select(col("stage"), col("reached"),
        when(col("stage") === 1, expr("(1000 * reached) div n_total"))
          .otherwise(when(col("prev_reached") > 0,
            expr("(1000 * reached) div prev_reached")))
          .as("conv_permille"),
        col("median_delta_us"))
      .orderBy(col("stage"))
  }

  /** [[funnelRates]] on the events table. */
  def eventFunnelRates(spark: SparkSession, dir: String): DataFrame =
    funnelRates(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")))

  /** Cohort retention: users grouped by first-activity week, counted
    * distinct in each subsequent week offset. All calendar math is
    * integer day arithmetic from a fixed epoch (no engine-specific
    * week-truncation semantics). Two key-partitioned aggregations: the
    * first-touch min shares its `user_id` shuffle with the join back
    * (AQE reuses the exchange), the cohort-cell count-distinct shuffles
    * |active (user, cohort, offset)| triples — already deduplicated
    * map-side, so the wire carries at most users × weeks rows, not the
    * event log.
    */
  def cohortRetention(spark: SparkSession, dir: String,
                      epoch: String = "2024-01-01"): DataFrame =
    retention(Tables.events(spark, dir)
      .select(col("user_id"), datediff(to_date(col("ts")), lit(epoch).cast("date")).as("day")))

  /** Width-bucket histogram of a measure per group — the distribution
    * profile an optimizer or data-quality monitor keeps per column. The
    * bin is one fixed-tree double expression (portable) clamped to
    * [0, bins−1]; one map-side-combined groupBy, shuffle O(groups×bins).
    */
  def histogram(spark: SparkSession, dir: String, lo: Double = 0.0,
                hi: Double = 20.0, bins: Int = 10): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        least(greatest(floor(((col("value") - lit(lo)) * lit(bins.toDouble)) / lit(hi - lo)),
          lit(0.0)), lit(bins - 1.0)).cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))

  /** Equi-depth (equal-frequency) histogram — the histogram an optimizer
    * or drift monitor actually wants when the data is skewed (equal-WIDTH
    * bins put 99% of a heavy-tailed measure in one bin). The scalable
    * shape: interior bucket edges come from ONE exact-percentile
    * aggregate (a single row), broadcast back, and bucket assignment is
    * a chain of 7 comparisons inside codegen — the corpus itself never
    * sorts globally (the naive ntile() spelling funnels every row
    * through one partition, the thing this plan exists to avoid).
    * Bucket k = 1 + #edges below the value, so ties land in the lowest
    * eligible bucket deterministically; counts vary only where edge
    * duplicates collapse buckets (skew made visible, not hidden).
    */
  def equidepthHistogram(spark: SparkSession, dir: String,
                         buckets: Int = 8): DataFrame = {
    require(buckets >= 2 && buckets <= 64, s"buckets in [2,64], got $buckets")
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull).select(col("value"))
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val edges = ev.agg(
      expr(s"percentile(value, array(${fracs.mkString(",")}))").as("qs"))
    val bucket = (0 until buckets - 1)
      .map(i => (col("value") > col("qs").getItem(i)).cast("long"))
      .reduce(_ + _) + 1
    ev.crossJoin(broadcast(edges))
      .select(col("value"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** OHLC resample: first/open, last/close, min, max, count of a measure
    * per (series, time bucket) — the downsampling step every telemetry
    * store needs before plotting or modeling. Open/close come from TWO
    * orderings of ONE window partition (Catalyst plans a single exchange
    * with two in-partition sorts — no self-join, no collect_list); ties
    * break on event_id so the result is deterministic at any parallelism.
    */
  def resampleOhlc(spark: SparkSession, dir: String,
                   bucketSec: Long = 3600L): DataFrame =
    ohlcBars(Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us")), bucketSec)

  /** DataFrame form of [[resampleOhlc]]: `ev` needs (event_type,
    * event_id, value, ts_us).
    */
  def ohlcBars(ev0: DataFrame, bucketSec: Long = 3600L): DataFrame = {
    val us = bucketSec * 1000000L
    val ev = ev0.withColumn("bucket", expr(s"ts_us div ${us}L"))
    val fwd = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts_us"), col("event_id"))
    val bwd = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("rn_o", row_number().over(fwd))
      .withColumn("rn_c", row_number().over(bwd))
      .groupBy(col("event_type"), col("bucket"))
      .agg(
        min(when(col("rn_o") === 1, col("value"))).as("open"),
        min(when(col("rn_c") === 1, col("value"))).as("close"),
        min(col("value")).as("lo"),
        max(col("value")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Gap-filled time-series resample with forward fill: every
    * (series, bucket) cell in each series' observed span exists in the
    * output — empty buckets carry n = 0 and the last observed value
    * (telemetry dashboards and downstream window math need dense series;
    * the reference's monitor emits sparse ticks). The per-bucket "last"
    * rides max(struct(ts, id, value)) — the OHLC close trick, so the
    * fill source is deterministic at any parallelism — and the fill
    * itself is one last(ignoreNulls) running window per series.
    *
    * Scale shape: the dense grid is series × buckets-in-span rows —
    * generated by a map-side sequence() explode from each series' 1-row
    * min/max, never a cross join against a calendar table; one exchange
    * on the series key serves both the bucket agg and the fill window.
    */
  def gapFillResample(spark: SparkSession, dir: String,
                      bucketSec: Long = 3600L): DataFrame = {
    val us = bucketSec * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("bucket", expr(s"ts_us div ${us}L"))
    val observed = ev.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("ts_us"), col("event_id"), col("value")))
          .getField("value").as("last_value"))
    val grid = observed.groupBy(col("event_type"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi)")).as("bucket"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("last_value"), ignoreNulls = true).over(w).as("value_ff"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** [[gapFillResample]]'s LINEAR sibling — the third standard resample
    * fill (LOCF there, bucket-mean+LOCF in [[gapFill]], straight-line
    * here): an empty bucket takes the line between its bracketing
    * observed anchors, `v = v_prev + (v_next − v_prev)·(b − b_prev) div
    * (b_next − b_prev)`, all in exact integer micro-units (`div` and
    * DuckDB `//` both truncate toward zero — verified on negatives, and
    * the negative-slope truncation is spec-pinned by hand — so the
    * oracle replays bit-for-bit; a float lerp would drift by ulps
    * between engines). Every spine bucket is BRACKETED by construction:
    * the grid spans each series' [min, max] OBSERVED bucket and both
    * endpoints are anchors, so there are no head/tail buckets to
    * backfill and the lerp is total. The anchor of an observed bucket
    * is the deterministic OHLC close (max struct by (ts, id)).
    *
    * Scale shape: identical to [[gapFillResample]] — spine rows are
    * span/bucket per series from a map-side `sequence()` explode, and
    * ONE exchange on the series key serves the bucket aggregate plus
    * BOTH fill windows (the forward and backward frames share the same
    * partitioning and sort, so Catalyst plans them over one shuffle).
    */
  def gapFillLinear(spark: SparkSession, dir: String,
                    bucketSec: Long = 3600L): DataFrame =
    gapFillLinearFrames(
      Tables.events(spark, dir)
        .select(col("event_type").as("series"), col("event_id"),
          expr("cast(round(value * 1000000.0D) as bigint)").as("vm"),
          unix_micros(col("ts")).as("ts_us")),
      bucketSec * 1000000L)

  /** DataFrame form of [[gapFillLinear]]: `ev` needs (series, event_id,
    * vm, ts_us) columns; buckets are `ts_us div bucketUs`.
    */
  def gapFillLinearFrames(ev0: DataFrame, bucketUs: Long): DataFrame = {
    val ev = ev0.withColumn("bucket", expr(s"ts_us div ${bucketUs}L"))
    val observed = ev.groupBy(col("series"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("ts_us"), col("event_id"), col("vm")))
          .getField("vm").as("anchor"))
    val grid = observed.groupBy(col("series"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("series"), explode(expr("sequence(lo, hi)")).as("bucket"))
    val wf = Window.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = Window.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(observed, Seq("series", "bucket"), "left")
      .select(col("series"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("anchor"),
        last(col("anchor"), ignoreNulls = true).over(wf).as("pv"),
        last(when(col("anchor").isNotNull, col("bucket")), ignoreNulls = true)
          .over(wf).as("pb"),
        first(col("anchor"), ignoreNulls = true).over(wb).as("nv"),
        first(when(col("anchor").isNotNull, col("bucket")), ignoreNulls = true)
          .over(wb).as("nb"))
      .withColumn("value_micro",
        // every gap bucket is bracketed (grid endpoints are anchors),
        // so pv/pb/nv/nb are all non-null here and the lerp is total
        when(col("anchor").isNotNull, col("anchor"))
          .otherwise(col("pv") + expr("(nv - pv) * (bucket - pb) div (nb - pb)")))
      .select(col("series"), col("bucket"), col("n"), col("value_micro"))
      .orderBy(col("series"), col("bucket"))
  }

  /** Partial (mergeable) per-group event stats in exact integer
    * micro-units: the persisted form of an incrementally-maintained
    * aggregate table. count/sum/min/max are ALGEBRAIC — a partial row
    * absorbs any number of raw rows and two partials merge losslessly —
    * so a 100 TB base corpus is aggregated ONCE, persisted as O(groups)
    * rows, and each ingest increment costs O(increment) + a merge of two
    * tiny tables (the HLL-sketch-table workflow, §2b 28l, for plain
    * aggregates). Values are fixed-point micros: long sums are exact and
    * associative, so base+increment merge order can't perturb a bit.
    */
  def eventStatsPartial(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total_micro"),
        min(col("v")).as("lo_micro"), max(col("v")).as("hi_micro"))

  /** Merge any union of [[eventStatsPartial]] tables back into one
    * consistent aggregate (count/sum re-sum, min/max re-extreme); the
    * derived mean is integer floor division — engine-portable.
    */
  def eventStatsMerge(parts: DataFrame): DataFrame =
    parts.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("total_micro")).as("total_micro"),
        min(col("lo_micro")).as("lo_micro"), max(col("hi_micro")).as("hi_micro"))
      .withColumn("mean_micro", expr("total_micro div n"))

  /** Incremental maintenance end-to-end: the "base" aggregate (events
    * before `cutTs`) merged with the increment (events at/after it) —
    * the base side would be a persisted parquet table in production and
    * is never rescanned; the oracle recomputes from ALL raw rows and
    * must hash-match, proving merge = recompute.
    */
  def incrementalEventStats(spark: SparkSession, dir: String,
                            cutTs: String = "2024-01-21 00:00:00"): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cut = lit(cutTs).cast("timestamp")
    eventStatsMerge(
        eventStatsPartial(ev.filter(col("ts") < cut))
          .unionByName(eventStatsPartial(ev.filter(col("ts") >= cut))))
      .orderBy(col("event_type"))
  }

  /** TPC-H Q21 pattern (waiting suppliers), adapted to this schema:
    * "late" = shipped more than `lateDays` after the order date (the
    * reference schema's receipt/commit dates aren't in the testdata).
    * The classic formulation is a correlated EXISTS (another supplier on
    * the order) AND NOT EXISTS (another LATE supplier) — both
    * DECORRELATED here into ONE per-order aggregate (distinct suppliers
    * m, distinct late suppliers k) joined back to the late rows: a row
    * qualifies iff m > 1 and k == 1. Two self-joins against lineitem
    * become a single groupBy(l_orderkey) + broadcast-eligible join-back,
    * the only shape whose shuffle is O(|orders|) instead of
    * O(|lineitem|²/orders). Counts late LINE rows per supplier (the
    * original's count(*) over l1), top-100 by numwait.
    */
  def waitingSuppliers(spark: SparkSession, dir: String,
                       lateDays: Int = 90): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
    val perOrder = li.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("m"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("k"))
      .filter(col("m") > 1 && col("k") === 1)
      .select(col("ok"))
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
    li.filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("ok"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Robust anomaly detection per group: median/MAD outliers. The median
    * and the median absolute deviation are computed with the same exact
    * interpolated percentile the oracle uses, then every event scores
    * |value − med| / MAD; rows above `cut` are the anomalies. Two grouped
    * percentile passes + broadcast join-backs (the stats are one row per
    * event_type) — the events table itself is scanned twice but never
    * self-joined, and both scans prune to (event_type, event_id, value).
    * MAD beats stddev-z-scores at scale because a fat tail inflates a
    * stddev until the outliers that caused it look normal; the median
    * pair is unmoved by any minority of corrupt rows.
    */
  def anomalyMad(spark: SparkSession, dir: String, cut: Double = 6.0): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    val stats = madStats(ev, col("event_type"), col("value"))
      .withColumnRenamed("k", "event_type")
    ev.join(broadcast(stats), "event_type")
      // mad == 0 (a majority-constant group) would make every score ∞;
      // such a group has no meaningful scale, so it emits no anomalies
      .filter(col("mad") > 0 && abs(col("value") - col("med")) > col("mad") * lit(cut))
      .select(col("event_type"), col("event_id"),
        round(col("value"), 4).as("value_r"),
        round(abs(col("value") - col("med")) / col("mad"), 4).as("mad_score"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Top user journeys: each user's first `k` event types (by time, id
    * tiebreak) joined into a path string, counted across users and
    * ranked — the product-analytics "common paths" census that sits
    * beside [[funnelUsers]] (the funnel asks "who followed MY order?";
    * this asks "what orders actually happen?").
    *
    * Scale shape: the row_number window prunes each user to k rows
    * BEFORE the path fold, so the collect carries exactly ≤k tiny rows
    * per user — never a whole session history — and the fold groupBy
    * reuses the window's user-key exchange (one shuffle of (user, type,
    * rank) triples total). The census groupBy lands at O(distinct
    * paths) ≤ |event types|^k rows with map-side combine; top-N is a
    * TakeOrdered, never a full sort.
    */
  def topPaths(spark: SparkSession, dir: String, k: Int = 5,
               topN: Int = 20): DataFrame = {
    import graft.model.Documents
    topPathsFrom(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"),
          Documents.tsSec(col("ts")).as("t"), col("event_id")),
      k, topN)
  }

  /** [[topPaths]] over any (user_id, event_type, t, event_id) frame. */
  def topPathsFrom(ev: DataFrame, k: Int = 5, topN: Int = 20): DataFrame = {
    require(k >= 1 && k <= 50, s"k in [1,50], got $k")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    ev
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("rn"), col("event_type"))))
        .as("evs"))
      .select(expr("array_join(transform(evs, e -> e.event_type), '>')")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topN)
  }

  /** Time-weighted average per series (TWAP — the correct mean of a
    * SAMPLED signal, where the plain row mean over-weights bursts): each
    * observation holds its value until the next one, so it contributes
    * value × holding-time; the last observation has no duration and
    * drops. One (series) window for the lead + one groupBy — a single
    * exchange. Exact integers end-to-end: micro-unit values × second
    * durations summed as longs (headroom to ~9·10¹⁸ ≈ 3·10⁵ series-years
    * of micro-value-seconds per series; move the two sums to
    * decimal(38,0) beyond that), one integer floor division at the end —
    * bit-equal under any partitioning and in the oracle. Same-second
    * observations tie-break by id: the earlier holds for 0 s.
    */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    import graft.model.Documents
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), Documents.tsSec(col("ts")).as("t"), col("event_id"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .withColumn("tn", lead(col("t"), 1).over(w))
      .filter(col("tn").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(col("tn") - col("t")).as("sdt"),
        sum((col("tn") - col("t")) * col("vm")).as("svdt"))
      .select(col("event_type"), col("sdt"),
        expr("svdt div sdt").as("twap_micro"))
      .orderBy(col("event_type"))
  }

  /** Exponential moving average per series with dyadic weights — EWMA at
    * α = 1/2 truncated to the last `taps` samples, the standard smoother
    * for sensor/metric series (reference: the monitor's per-topic rate
    * signal, scenario.py:238-274, which a consumer would smooth exactly
    * like this). Weights 2^(taps−1−k) are exact longs over exact
    * micro-unit values, so numerator and denominator are INTEGER sums —
    * no fp accumulation anywhere, any engine agrees bit-for-bit — and
    * the one floor division at the end is the only rounding. All `taps`
    * lag() columns ride ONE window pass (one exchange+sort per series
    * key; Catalyst plans a single Window operator). Truncation error vs
    * the infinite EWMA is 2^-taps ≤ 1.5e-5 of the signal — below
    * micro-unit resolution. NULL samples contribute neither value nor
    * weight (a sensor dropping frames), and all-NULL head rows are
    * filtered by the den > 0 guard.
    */
  def ewma(spark: SparkSession, dir: String, taps: Int = 16): DataFrame = {
    import graft.model.Documents
    require(taps >= 1 && taps <= 32, s"taps must be in [1, 32], got $taps")
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("event_id"))
    val num = (0 until taps).map { k =>
      coalesce(lag(col("vm"), k).over(w) * lit(1L << (taps - 1 - k)), lit(0L))
    }.reduce(_ + _)
    val den = (0 until taps).map { k =>
      when(lag(col("vm"), k).over(w).isNotNull, lit(1L << (taps - 1 - k)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    Tables.events(spark, dir)
      .select(col("event_type"), Documents.tsSec(col("ts")).as("t"), col("event_id"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .withColumn("num", num)
      .withColumn("den", den)
      .filter(col("den") > 0L)
      .select(col("event_type"), col("event_id"), expr("num div den").as("ewma_micro"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Market-basket association rules over order baskets: part pairs
    * co-bought in one order, scored by support / confidence / lift.
    * Candidate pairs come from an equality self-join on the order key —
    * O(Σ k²) over basket sizes k — and baskets above `maxBasket` are
    * dropped FIRST (the hot-bucket cap, same contract as the shingle
    * maxDocFreq): one pathological 10⁵-item order would otherwise own
    * the entire pair shuffle. Counts are exact longs and every score is
    * a single IEEE division of exact integer products (lift = n12·N /
    * (n1·n2)), so any engine agrees bit-for-bit. The item-count dim is
    * bounded by |parts| and broadcasts back; the one real shuffle is the
    * pair groupBy. The global order count is a single-row broadcast
    * (whitelisted in the cross-join audit like the other scalar
    * broadcasts).
    */
  def basketLift(spark: SparkSession, dir: String, minSupport: Long = 3L,
                 maxBasket: Int = 1000, topK: Int = 50,
                 cache: Boolean = true): DataFrame = {
    // the distinct basket table feeds every downstream branch (sizes,
    // order count, item counts, both self-join sides) and the branches
    // are differently pruned, so exchange reuse can't cover them all —
    // persisted so the lineitem scan + distinct shuffle are paid once
    // (the tfidf discipline, releasable via Dedup.unpersistShared)
    val li = graft.ops.OpCache.share(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct(),
      cache)
    val sizes = li.groupBy(col("ok")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasket)
    val keep = graft.ops.OpCache.share(li.join(sizes.select("ok"), "ok"), cache)
    val nOrders = sizes.agg(count(lit(1)).as("n_orders"))
    val itemCnt = keep.groupBy(col("pk")).agg(count(lit(1)).as("ni"))
    keep.as("a").join(keep.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pk1"), col("b.pk").as("pk2"))
      .agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minSupport)
      .join(broadcast(itemCnt.select(col("pk").as("pk1"), col("ni").as("n1"))), "pk1")
      .join(broadcast(itemCnt.select(col("pk").as("pk2"), col("ni").as("n2"))), "pk2")
      .crossJoin(broadcast(nOrders))
      .select(col("pk1"), col("pk2"), col("n12"),
        (col("n12").cast("double") / col("n_orders").cast("double")).as("support"),
        (col("n12").cast("double") / col("n1").cast("double")).as("confidence"),
        ((col("n12") * col("n_orders")).cast("double") /
          (col("n1") * col("n2")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("pk1"), col("pk2"))
      .limit(topK)
  }

  /** 2-D skyline (Pareto frontier): rows where no other row is at least
    * as good on BOTH axes and strictly better on one — minimize `x`,
    * maximize `y` (price-vs-capability shortlists, cost-vs-quality
    * curation cuts). Equal-(x,y) duplicates all survive (nothing strictly
    * dominates them).
    *
    * The skyline is DISTRIBUTIVE: the global frontier is a subset of the
    * union of per-partition frontiers, so phase 1 sweeps each partition
    * locally (sort by (x asc, y desc) + running-max scan — zero shuffle)
    * and phase 2 re-sweeps only the survivors on one partition. At 100 TB
    * phase 1 is the whole scan but emits only frontier candidates
    * (typically O(√n)-ish per partition); the single-partition phase 2 is
    * sized by the frontier, not the data. A genuinely adversarial input
    * (all points on the frontier) degrades to its true output size —
    * unavoidable, the answer IS that big. `mapPartitions` is the honest
    * tool for the sweep (per-partition imperative scan, tier (d) of the
    * extension ladder) — a window spelling needs a GLOBAL ordering, which
    * is exactly the single-partition bottleneck phase 1 exists to avoid.
    */
  def skyline2D(points: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.LongType)))
    def sweep(it: Iterator[Row]): Iterator[Row] = new Iterator[Row] {
      // rows arrive sorted by (x asc, y desc, id): survivors have y equal
      // to their x-group's max AND strictly above every cheaper group's
      private val buf = it.buffered
      private var prevBest = Long.MinValue // max y among strictly smaller x
      private var curX = Double.NaN
      private var curGroupMax = Long.MinValue
      private var nextRow: Row = null
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && buf.hasNext) {
          val r = buf.head
          val x = r.getDouble(1); val y = r.getLong(2)
          if (curX.isNaN || x != curX) {
            prevBest = math.max(prevBest, curGroupMax)
            curX = x; curGroupMax = y // first row of group = group max y
          }
          if (y == curGroupMax && y > prevBest) nextRow = r
          buf.next()
        }
      }
      advance()
      def hasNext: Boolean = nextRow != null
      def next(): Row = { val r = nextRow; advance(); r }
    }
    val typed = points.select(col("id").cast("long"), col("x").cast("double"),
      col("y").cast("long"))
    val local = points.sparkSession.createDataFrame(
      typed.sortWithinPartitions(col("x"), col("y").desc, col("id"))
        .rdd.mapPartitions(sweep), schema)
    points.sparkSession.createDataFrame(
      local.repartition(1)
        .sortWithinPartitions(col("x"), col("y").desc, col("id"))
        .rdd.mapPartitions(sweep), schema)
  }

  /** [[skyline2D]] of the part catalog: cheapest-for-their-size parts
    * (minimize retail price, maximize size).
    */
  def partSkyline(spark: SparkSession, dir: String): DataFrame =
    skyline2D(Tables.part(spark, dir)
        .select(col("p_partkey").as("id"), col("p_retailprice").as("x"),
          col("p_size").cast("long").as("y")))
      .select(col("id").as("p_partkey"), col("x").as("p_retailprice"),
        col("y").as("p_size"))
      .orderBy(col("p_partkey"))

  /** The train step of [[anomalyMad]], exposed on its own: per-key
    * `(med, mad)` from exact interpolated percentiles. A persisted stats
    * table from this feeds the streaming scorer
    * ([[graft.streaming.Monitor.anomalyStream]]) — train offline on the
    * corpus, score online statelessly.
    */
  def madStats(ev: DataFrame, keyCol: Column, valueCol: Column): DataFrame = {
    val base = ev.select(keyCol.as("k"), valueCol.as("v"))
    val med = base.groupBy(col("k")).agg(expr("percentile(v, 0.5D)").as("med"))
    base.join(broadcast(med), "k")
      .groupBy(col("k"), col("med"))
      .agg(expr("percentile(abs(v - med), 0.5D)").as("mad"))
      .select(col("k"), col("med"), col("mad"))
  }

  /** SCD2 (slowly-changing-dimension type 2) version builder: turn a
    * change-event log into versioned dimension rows
    * `(k, state, valid_from, valid_to)` — consecutive duplicate states
    * collapse, `valid_to` is the NEXT change (null while current). The
    * warehouse pattern that lets facts join the attribute value that was
    * true AT FACT TIME instead of today's value.
    *
    * Same-instant races resolve deterministically: the per-(key, ts)
    * pre-aggregate keeps the max-tiebreak event via one max(struct) —
    * map-side combinable, no window. Both windows (change detection,
    * valid_to) share one (k, valid_from) exchange+sort; the filter
    * between them doesn't repartition, so the whole build is ONE shuffle
    * of the change log — at 100 TB the dimension log is usually the
    * small table, and the output is O(actual changes), not O(events).
    */
  def scd2Versions(ev: DataFrame, key: Column, tsSec: Column, tie: Column,
                   state: Column): DataFrame = {
    val perTs = ev.groupBy(key.as("k"), tsSec.as("valid_from"))
      .agg(max(struct(tie.as("tb"), state.as("s"))).getField("s").as("state"))
    val w = Window.partitionBy(col("k")).orderBy(col("valid_from"))
    perTs.withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("state") =!= col("prev"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(col("k"), col("state"), col("valid_from"), col("valid_to"))
  }

  /** The [[scd2Versions]] dimension over the events stream: a user's
    * "segment" is their latest non-purchase activity class.
    */
  def userSegmentsScd2(spark: SparkSession, dir: String): DataFrame = {
    import graft.model.Documents
    scd2Versions(
        Tables.events(spark, dir).filter(col("event_type") =!= "purchase"),
        col("user_id"), Documents.tsSec(col("ts")), col("event_id"),
        col("event_type"))
      .select(col("k").as("user_id"), col("state"),
        col("valid_from").as("valid_from_sec"), col("valid_to").as("valid_to_sec"))
      .orderBy(col("user_id"), col("valid_from_sec"))
  }

  /** Point-in-time attribution: every purchase joined to the segment
    * version valid AT PURCHASE TIME (never today's — the classic SCD2
    * fact join), revenue rolled up per segment. The PIT join IS an as-of
    * join against version start times plus a validity check (vacuous for
    * a gap-free log, load-bearing for dimensions with deleted periods):
    * one key shuffle via [[graft.store.DocumentStore.asofJoin]], where
    * the naive BETWEEN join plans per-key row multiplication. Purchases
    * before any version attribute to 'none'.
    */
  def pitAttribution(spark: SparkSession, dir: String): DataFrame = {
    import graft.model.Documents
    val ev = Tables.events(spark, dir)
    val sec = Documents.tsSec(col("ts"))
    val dim = userSegmentsScd2(spark, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), sec.as("t"), col("event_id"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("v_micro"))
    // ONE struct payload, not two columns: asofJoin's per-column
    // last(ignoreNulls) would skip the open version's NULL valid_to and
    // resurrect the previous version's end date — a struct is null only
    // when no version precedes the fact at all
    graft.store.DocumentStore.asofJoin(
        facts,
        dim.select(col("user_id"), col("valid_from_sec").as("t"),
          struct(col("state"), col("valid_to_sec")).as("seg")),
        "user_id", "t", Seq("seg"))
      .filter(col("asof_seg").isNull || col("asof_seg.valid_to_sec").isNull ||
        col("t") < col("asof_seg.valid_to_sec"))
      .groupBy(coalesce(col("asof_seg.state"), lit("none")).as("state"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v_micro")).as("value_micro"))
      .orderBy(col("state"))
  }

  /** Regular-grid resample with forward fill (LOCF) — the gap-filling
    * step every downstream time-series consumer assumes has already
    * happened (the reference's monitor emits on a wall-clock timer,
    * scenario.py:141-147, so its output IS a regular grid; data arriving
    * through the skip-on-error capture path is not). Per series: hourly
    * mean in exact micro-units (per-row micro rounding, integer sum, one
    * truncating division per observed bucket), a per-series hour spine
    * from `sequence(min_h, max_h)` (never a global calendar — each
    * series fills only its own span), and last-observation-carried-
    * forward over the gaps via `last(_, ignoreNulls)`.
    *
    * Scale shape: the hourly groupBy is the one corpus-scale shuffle
    * (map-side combined, O(series × hours) out); the spine explode and
    * the LOCF window run on the BUCKETED table — 720 rows per series per
    * month, never raw events. The window is per-series (partitionBy), so
    * no single-partition funnel; a series' span is bounded by retention
    * policy, not corpus size. First spine hour is an observed bucket by
    * construction (min_h comes from data), so `value_micro` is never
    * NULL after the fill.
    */
  def gapFill(ev0: DataFrame, bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("obs_micro"))
    val spine = hourly.groupBy(col("series"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("series"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val w = Window.partitionBy(col("series")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("series", "h"), "left")
      .select(col("series"), col("h"),
        last(col("obs_micro"), ignoreNulls = true).over(w).as("value_micro"),
        col("obs_micro").isNotNull.as("observed"))
      .orderBy(col("series"), col("h"))
  }

  /** [[gapFill]] on the events table. */
  def eventGapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.events(spark, dir))

  /** Lag-k autocorrelation per series (ACF, lags 1..`maxLag`) over the
    * observed hourly buckets — the seasonality/persistence profile a
    * pipeline reads before choosing windows, watermarks, or forecast
    * features for a metric stream.
    *
    * Exactness: with n buckets, Σx = sx exact micro-integers, the
    * centered deviation is the INTEGER `d = n·x − sx` (no division, no
    * float mean); each lag-pair product is the fixed IEEE expression
    * `round(double(d_a)·double(d_b) / (1e6·n·n))` — both factors are
    * exactly-representable longs (< 2^53), the product and the one
    * division are correctly-rounded IEEE ops with ONE spelled
    * parenthesization, so the micro-rounded integers (and their exact
    * sums) match any engine bit-for-bit regardless of partial-agg order.
    * The denominator is the full-series Σd² (textbook ACF), computed
    * once per series and joined back.
    *
    * Scale shape: one O(events) bucketing shuffle; everything after runs
    * on the O(series × hours) bucket table — the lag pairing is an
    * equality self-join on (series, h+lag), shuffle O(buckets × lags),
    * AQE-splittable, never a window over raw events. Pairs require both
    * endpoints observed (gaps don't fabricate correlation; run
    * [[gapFill]] first for the LOCF convention instead).
    */
  def acf(ev0: DataFrame, maxLag: Int = 6, bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    require(maxLag >= 1 && maxLag <= 168, s"maxLag in [1,168], got $maxLag")
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))
    val stats = hourly.groupBy(col("series"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = hourly.join(broadcast(stats), "series")
      .select(col("series"), col("h"), col("n"),
        (col("n") * col("x") - col("sx")).as("d"))
    val den = dev.groupBy(col("series"), col("n"))
      .agg(sum(expr("cast(round(cast(d as double) * cast(d as double)" +
        " / (1000000.0D * n * n)) as bigint)")).as("den_micro"))
    val a = dev.select(col("series"), col("h"), col("d").as("da"),
      explode(sequence(lit(1), lit(maxLag))).as("lag"))
    val b = dev.select(col("series").as("sb"), col("h").as("hb"),
      col("d").as("db"), col("n"))
    val pairs = a.join(b,
        col("series") === col("sb") && col("h") + col("lag") === col("hb"))
      .drop("sb", "h", "hb")
    pairs
      .groupBy(col("series"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("cast(round(cast(da as double) * cast(db as double)" +
          " / (1000000.0D * n * n)) as bigint)")).as("num_micro"))
      .join(den.select(col("series"), col("den_micro")), "series")
      .select(col("series"), col("lag"), col("n_pairs"), col("num_micro"),
        col("den_micro"),
        (col("num_micro").cast("double") / col("den_micro").cast("double")).as("acf"))
      .orderBy(col("series"), col("lag"))
  }

  /** [[acf]] on the events table. */
  def eventAcf(spark: SparkSession, dir: String): DataFrame =
    acf(Tables.events(spark, dir))

  /** Durbin–Levinson recursion formulas for [[pacf]], as SQL text shared
    * VERBATIM between the Spark expressions and the DuckDB oracle (one
    * builder — the two spellings cannot drift): φ_kk = (ρ_k −
    * Σ_{j<k} φ_{k−1,j}·ρ_{k−j}) / (1 − Σ_{j<k} φ_{k−1,j}·ρ_j), sums
    * left-associated ascending j. */
  private[graft] def durbinFkk(k: Int): String =
    if (k == 1) "r1"
    else {
      val num = (1 until k).map(j => s"f${k - 1}$j * r${k - j}").mkString(" + ")
      val den = (1 until k).map(j => s"f${k - 1}$j * r$j").mkString(" + ")
      // nullif: a vanishing recursion denominator reads NULL on both
      // engines (ANSI Spark errors on /0 where DuckDB would not)
      s"(r$k - ($num)) / nullif(1.0 - ($den), 0.0)"
    }

  /** φ_{k,j} = φ_{k−1,j} − φ_kk·φ_{k−1,k−j} (shared like [[durbinFkk]]). */
  private[graft] def durbinFkj(k: Int, j: Int): String =
    s"f${k - 1}$j - f$k$k * f${k - 1}${k - j}"

  /** The finite-gated micro rendering of a Durbin–Levinson coefficient
    * (NaN/±inf from a zero-variance series or a degenerate recursion
    * denominator goes NULL identically on both engines — `abs(x) ≤
    * 1e308` is false for both non-finite cases). */
  private[graft] def durbinMicro(f: String): String =
    s"CASE WHEN abs($f) <= 1e308 THEN CAST(round(1000000.0 * $f) AS BIGINT) END"

  /** Partial autocorrelation per series (PACF, lags 1..`maxLag`) — the
    * other half of the Box–Jenkins identification pair beside [[acf]]:
    * the lag-k correlation with the shorter lags REGRESSED OUT, the plot
    * read to pick an AR order (an AR(p) series cuts off after lag p
    * where the raw ACF tails forever). Durbin–Levinson recursion over
    * the ACF values: ρ_k = num_micro/den_micro (exact integer inputs —
    * the [[acf]] machinery — so the starting doubles are bit-identical
    * on any engine), every later step a fixed left-associated IEEE tree
    * shared VERBATIM with the oracle via [[durbinFkk]]/[[durbinFkj]];
    * reported φ_kk rounds to micro at the END (intermediates keep full
    * precision — still deterministic, correctly-rounded ops in a fixed
    * order). Degenerate series (zero variance, vanishing recursion
    * denominator) yield NULL through the shared finite gate, and a lag
    * with no observed pairs NULL-propagates through the recursion —
    * never an engine-divergent NaN cast.
    *
    * Scale shape: everything corpus-sized is [[acf]]'s one bucketing
    * shuffle; the recursion is O(maxLag²) COLUMN expressions over the
    * O(series)-row pivoted ACF table — no window, no join, no fold.
    */
  def pacf(ev0: DataFrame, maxLag: Int = 6, bucketSec: Long = 3600L): DataFrame = {
    require(maxLag >= 1 && maxLag <= 9, s"maxLag in [1,9], got $maxLag")
    // den_micro > 0 inside the branch: a zero-variance series reads NULL
    // (ANSI-safe) and NULL-propagates through the whole recursion
    val aggs = (1 to maxLag).map(k => max(when(
      col("lag") === k && col("den_micro") > 0,
      col("num_micro").cast("double") / col("den_micro").cast("double")))
      .as(s"r$k"))
    var d = acf(ev0, maxLag, bucketSec)
      .groupBy(col("series")).agg(aggs.head, aggs.tail: _*)
    for (k <- 1 to maxLag) {
      d = d.withColumn(s"f$k$k", expr(durbinFkk(k)))
      for (j <- 1 until k)
        d = d.withColumn(s"f$k$j", expr(durbinFkj(k, j)))
    }
    val stack = (1 to maxLag)
      .map(k => s"${k}L, ${durbinMicro(s"f$k$k")}").mkString(", ")
    d.selectExpr("series", s"stack($maxLag, $stack) as (lag, pacf_micro)")
      .orderBy(col("series"), col("lag"))
  }

  /** [[pacf]] on the events table. */
  def eventPacf(spark: SparkSession, dir: String): DataFrame =
    pacf(Tables.events(spark, dir))

  /** Mann–Kendall trend test + Sen's slope per series — the
    * NONPARAMETRIC trend pair beside [[olsTrend]] (OLS trusts normal
    * residuals and is wrecked by single outliers; monitoring data has
    * both problems, which is why MK/Sen is the standard in environmental
    * and ops-metric trend detection): S = Σ_{i<j} sign(x_j − x_i) exact
    * integer, tie-corrected Var·18 = n(n−1)(2n+5) − Σt(t−1)(2t+5) exact
    * (int64-safe to ~10⁶ buckets — retention-bounded, documented), the
    * continuity-corrected z = (S ∓ 1)/√(Var) one fixed double tree, and
    * Sen's slope = the LOWER-median pairwise slope (the exact-lower-
    * median convention) with its (Δx, Δh) pair shipped as exact
    * evidence; the reported slope truncates Δx div Δh (micro-value
    * units per hour). Median ordering is the double ratio with an exact
    * (Δx, Δh) tiebreak — equal-valued rationals order deterministically.
    *
    * Scale shape: one O(events) bucketing shuffle, then the pairwise
    * self-join on the O(series × hours) bucket table — O(buckets²) per
    * series, bounded by the retention span like the DTW/acf spine,
    * never by event volume; the median window partitions by series
    * (bounded domain). Pairs need both endpoints observed.
    */
  def mannKendall(ev0: DataFrame, bucketSec: Long = 3600L,
                  cache: Boolean = true): DataFrame = {
    import graft.model.Documents
    // the bucket table feeds FOUR consumers (both self-join sides, the
    // tie rollup, the per-series count) whose projections differ —
    // uncached, each re-runs the O(events) bucketing shuffle (guide
    // §2.3/§2.4: four event scans → one). Retention-bounded
    // (series × hours), released per query via OpCache.
    val b = OpCache.share(ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x")),
      cache)
    // the pairwise expansion joins on the handful of series keys — a
    // sort-merge would shuffle both sides onto ≤|series| tasks (pure
    // skew); broadcasting the retention-bounded bucket table keeps the
    // expansion map-side (guide §3.1), same rows out
    val p = b.select(col("series"), col("h").as("hi"), col("x").as("xi"))
      .join(broadcast(b.select(col("series"), col("h").as("hj"), col("x").as("xj"))),
        Seq("series"))
      .filter(col("hi") < col("hj"))
      .select(col("series"), (col("xj") - col("xi")).as("dx"),
        (col("hj") - col("hi")).as("dh"))
    val s = p.groupBy(col("series"))
      .agg(sum(when(col("dx") > 0L, 1L).when(col("dx") < 0L, -1L)
        .otherwise(0L)).as("mk_s"))
    val nn = b.groupBy(col("series")).agg(count(lit(1)).as("n"))
    val ties = b.groupBy(col("series"), col("x"))
      .agg(count(lit(1)).as("t"))
      .filter(col("t") > 1L)
      .groupBy(col("series"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tt"))
    val v = nn.join(ties, Seq("series"), "left")
      .select(col("series"), col("n"),
        (expr("n * (n - 1) * (2 * n + 5)") - coalesce(col("tt"), lit(0L)))
          .as("var18"))
    val w = Window.partitionBy(col("series"))
      .orderBy(col("dx").cast("double") / col("dh").cast("double"),
        col("dx"), col("dh"))
    // the pair count is C(n,2) by construction (every observed-bucket
    // pair emits exactly one row), so the per-series total joins in from
    // the bucket counts instead of a second count-window pass over the
    // O(buckets²) pair table
    val med = p
      .withColumn("rn", row_number().over(w))
      .join(broadcast(nn.select(col("series"),
        expr("(n * (n - 1)) div 2").as("np"))), Seq("series"))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("series"), col("dx").as("sen_num_micro"),
        col("dh").as("sen_den_h"))
    s.join(v, "series").join(med, "series")
      .select(col("series"), col("n"), col("mk_s"), col("var18"),
        when(col("var18") > 0L && col("mk_s") =!= 0L, expr(
          """cast(round(1000000.0D * (cast(mk_s as double)
            | - case when mk_s > 0L then 1.0D else -1.0D end)
            | / sqrt(cast(var18 as double) / 18.0D)) as bigint)"""
            .stripMargin)).otherwise(0L).as("z_micro"),
        col("sen_num_micro"), col("sen_den_h"),
        expr("sen_num_micro div sen_den_h").as("sen_slope_micro_per_h"))
      .orderBy(col("series"))
  }

  /** [[mannKendall]] on the events table. */
  def eventMannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendall(Tables.events(spark, dir))

  /** Lagged cross-correlation of EVERY series against one designated
    * reference series (CCF, lags −`maxLag`..`maxLag`) over the observed
    * hourly buckets — the lead/lag profile a pipeline reads to learn
    * which metrics anticipate the KPI (`ccf(lag) = corr(x_s(h),
    * x_ref(h+lag))`: a peak at a positive lag means the series moves
    * BEFORE the reference). [[acf]]'s exactness playbook verbatim, with
    * the pair product now crossing two series: each term is the
    * fixed-tree `round(double(d_s)·double(d_ref) / (1e6·n_s·n_ref))`
    * (both deviations carry their own series' n factor), the
    * denominators are each series' own full Σd² micro sum, and the
    * correlation is one spelled division by the IEEE `sqrt` of their
    * product — correctly rounded in any engine, so the oracle replays
    * bit-for-bit. Zero-variance sides yield NULL via CASE.
    *
    * Scale shape: one O(events) bucketing shuffle; the reference
    * series' O(hours) deviation table broadcasts (one series is by
    * definition driver-small — a year is 8.8k rows), so the lag pairing
    * is a broadcast equality join with NO extra shuffle over the
    * O(series × hours × lags) expansion, then one map-side-combined
    * grouped agg. Profiling 10⁶ series against one KPI costs one pass.
    */
  def ccf(ev0: DataFrame, refSeries: String = "purchase", maxLag: Int = 6,
          bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))
    ccfFromBuckets(hourly, refSeries, maxLag)
  }

  /** [[ccf]] over an ALREADY-bucketed (series, h, x) table — the
    * bucket-log family convention, so the lead/lag profile refreshes
    * from the streaming-maintained hourly log without re-scanning raw
    * events.
    */
  def ccfFromBuckets(hourly: DataFrame, refSeries: String = "purchase",
                     maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1 && maxLag <= 168, s"maxLag in [1,168], got $maxLag")
    val stats = hourly.groupBy(col("series"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = hourly.join(broadcast(stats), "series")
      .select(col("series"), col("h"), col("n"),
        (col("n") * col("x") - col("sx")).as("d"))
    val den = dev.groupBy(col("series"), col("n"))
      .agg(sum(expr("cast(round(cast(d as double) * cast(d as double)" +
        " / (1000000.0D * n * n)) as bigint)")).as("den_micro"))
    val refDev = dev.filter(col("series") === lit(refSeries))
      .select(col("h").as("hr"), col("d").as("dr"), col("n").as("nr"))
    // the reference denominator RIDES the broadcast deviation rows (a
    // single-partition window over the one driver-small series — same
    // rounded terms, same integer sum as `den`) and surfaces as a
    // constant-per-group max: no 1-row cross join, no nested-loop plan
    val refWithDen = refDev.withColumn("den_ref",
      sum(expr("cast(round(cast(dr as double) * cast(dr as double)" +
        " / (1000000.0D * nr * nr)) as bigint)"))
        .over(Window.partitionBy(lit(0))))
    val a = dev.select(col("series"), col("h"), col("d"), col("n"),
      explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
    a.join(broadcast(refWithDen), col("h") + col("lag") === col("hr"))
      .groupBy(col("series"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("cast(round(cast(d as double) * cast(dr as double)" +
          " / (1000000.0D * n * nr)) as bigint)")).as("num_micro"),
        max(col("den_ref")).as("den_ref"))
      .join(broadcast(den), "series")
      .select(col("series"), col("lag"), col("n_pairs"), col("num_micro"),
        col("den_micro"), col("den_ref"),
        when(col("den_micro") > 0 && col("den_ref") > 0,
          col("num_micro").cast("double")
            / sqrt(col("den_micro").cast("double") * col("den_ref").cast("double")))
          .as("ccf"))
      .orderBy(col("series"), col("lag"))
  }

  /** [[ccf]] on the events table (reference series: purchase). */
  def eventCcf(spark: SparkSession, dir: String): DataFrame =
    ccf(Tables.events(spark, dir))

  /** Holt double exponential smoothing (level + linear trend) per series
    * over observed hourly mean-micro buckets — the trend-aware sibling of
    * [[ewma]] (which has no trend term and lags every ramp): the smoother
    * a pipeline runs on a metric stream before alerting on slope, not
    * just level. Dyadic gains α=1/2, β=1/4 keep the recurrence in EXACT
    * integer micro-units via arithmetic shifts (floor division by 2ᵏ —
    * `shiftright` here, `>>` in the oracle, both floor on negatives):
    *   l_t = (v_t + l_{t−1} + b_{t−1}) >> 1
    *   b_t = (l_t − l_{t−1} + 3·b_{t−1}) >> 2,  l_1 = v_1, b_1 = 0
    * so the whole trajectory replays bit-for-bit on any engine or
    * partitioning. The recurrence is inherently sequential (each state
    * feeds the next), so it runs as ONE typed per-series fold (sort the
    * series' buckets, LINEAR scan carrying two longs) — a window cannot
    * hold 2-dimensional state, a driver loop is one job per bucket, and
    * the expression-level `aggregate`-append spelling is O(buckets²) per
    * series (every step copies the grown array — 10⁸ element copies for
    * one series-year), which is why this op (alone in the ts family)
    * steps out of pure expressions into `flatMapGroups`.
    *
    * Scale shape: one O(events) bucketing shuffle (map-side partial agg),
    * then one exchange on the series key groups each series' buckets;
    * per-series memory is O(buckets-in-span) — bounded by retention
    * policy (a year of hourly buckets is 8.8k rows), never by corpus
    * size, the same spine contract as [[gapFill]]/[[acf]]. Series
    * themselves are the parallelism unit: 10⁶ metric streams fan across
    * the cluster, no single-partition funnel. The streaming twin
    * ([[graft.streaming.Monitor.holtStream]]) carries the same recurrence
    * in six longs of state per series.
    */
  def holt(ev0: DataFrame, bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))
    holtFromBuckets(hourly)
  }

  /** [[holt]]'s fold over an ALREADY-bucketed (series, h, x) table — the
    * bucket-log family convention ([[hourlyMerge]]/[[seasonalFromHourly]]
    * and the streaming-maintained `Monitor.readHourlyBuckets` view), so
    * the smoother refreshes without re-scanning raw events. Columns:
    * series string, h long, x long (exact micro bucket mean). */
  def holtFromBuckets(buckets: DataFrame): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    buckets.select(col("series").cast("string"), col("h").cast("long"),
        col("x").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, Long, Long)]) =>
        val pts = it.toArray.sortBy(_._2)
        var l = 0L
        var b = 0L
        var first = true
        pts.iterator.map { case (_, h, v) =>
          if (first) { l = v; b = 0L; first = false }
          else {
            val l2 = (v + l + b) >> 1 // arithmetic shift == floor div 2
            b = (l2 - l + 3L * b) >> 2
            l = l2
          }
          (k, h, v, l, b)
        }
      }
      .toDF("series", "h", "v_micro", "level_micro", "trend_micro")
      .orderBy(col("series"), col("h"))
  }

  /** [[holt]] on the events table. */
  def eventHolt(spark: SparkSession, dir: String): DataFrame =
    holt(Tables.events(spark, dir))

  /** One-step-ahead Holt forecast backtest per series — the accuracy
    * audit a pipeline runs BEFORE trusting a smoother's alerts: at each
    * observed bucket after the first, the forecast is the PREVIOUS
    * observed bucket's `level + trend`, scored against the realized
    * bucket mean. Errors stay exact integers: `mae_micro` is the
    * truncating integer mean of |v − f|, `smape_permille` the integer
    * mean of the per-bucket `2000·|e| div (|v| + |f|)` terms (zero
    * denominators contribute zero) — no fp accumulation anywhere, so the
    * scores replay bit-for-bit in the oracle.
    *
    * Scale shape: everything beyond [[holt]]'s own two shuffles is one
    * lag window + one grouped aggregate over the O(series × hours)
    * bucket table — never raw events.
    */
  def holtBacktest(ev0: DataFrame, bucketSec: Long = 3600L): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("h"))
    holt(ev0, bucketSec)
      .withColumn("f",
        lag(col("level_micro"), 1).over(w) + lag(col("trend_micro"), 1).over(w))
      .filter(col("f").isNotNull)
      .withColumn("e", abs(col("v_micro") - col("f")))
      .groupBy(col("series"))
      .agg(count(lit(1)).as("n_eval"),
        expr("sum(e) div count(1)").as("mae_micro"),
        expr("sum(CASE WHEN abs(v_micro) + abs(f) > 0" +
          " THEN (2000L * e) div (abs(v_micro) + abs(f)) ELSE 0L END)" +
          " div count(1)").as("smape_permille"))
      .orderBy(col("series"))
  }

  /** [[holtBacktest]] on the events table. */
  def eventHoltBacktest(spark: SparkSession, dir: String): DataFrame =
    holtBacktest(Tables.events(spark, dir))

  /** Holt-Winters ADDITIVE smoothing per series (level + linear trend +
    * hour-of-day seasonal state — the diurnal-aware completion of
    * [[holt]]: a daily traffic wave reads as zero trend here instead of
    * an oscillating slope). Seasonal state is one slot per `h % period`
    * (period 24 = hour-of-day, the [[seasonalProfile]] convention), so
    * gap buckets never shift the seasonal alignment. Dyadic gains
    * α=1/2, β=1/4, γ=1/4 keep all three recurrences in exact integer
    * micro-units via arithmetic shifts:
    *   l_t = (v_t − s_slot + l' + b') >> 1
    *   b_t = (l_t − l' + 3·b') >> 2
    *   s_slot ← (v_t − l_t + 3·s_slot) >> 2,  l_1 = v_1, b_1 = 0, s = 0⃗
    * (the zero seasonal init makes the first period behave like plain
    * Holt while slots warm up — fully deterministic, no init heuristic).
    *
    * Scale shape: identical to [[holt]] — one O(events) bucketing
    * shuffle, one series exchange, a LINEAR typed fold carrying
    * 2 + `period` longs of state; per-series memory is the bucket span,
    * series are the parallelism unit. Oracle replays the fold as a
    * per-series recursive CTE carrying the seasonal slots as a LIST
    * column.
    */
  def holtWinters(ev0: DataFrame, bucketSec: Long = 3600L,
                  period: Int = 24): DataFrame = {
    import graft.model.Documents
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))
    holtWintersFromBuckets(hourly, period)
  }

  /** [[holtWinters]]'s fold over an already-bucketed (series, h, x)
    * table — the bucket-log family convention, same as
    * [[holtFromBuckets]]. */
  def holtWintersFromBuckets(buckets: DataFrame, period: Int = 24): DataFrame = {
    require(period >= 2 && period <= 8784, s"period in [2,8784], got $period")
    val spark = buckets.sparkSession
    import spark.implicits._
    buckets.select(col("series").cast("string"), col("h").cast("long"),
        col("x").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, Long, Long)]) =>
        val pts = it.toArray.sortBy(_._2)
        val seas = new Array[Long](period)
        var l = 0L
        var b = 0L
        var first = true
        pts.iterator.map { case (_, h, v) =>
          val slot = (h % period).toInt
          val sp = seas(slot)
          if (first) { l = v; b = 0L; first = false }
          else {
            val l2 = (v - sp + l + b) >> 1
            b = (l2 - l + 3L * b) >> 2
            l = l2
          }
          seas(slot) = (v - l + 3L * sp) >> 2
          (k, h, v, l, b, seas(slot))
        }
      }
      .toDF("series", "h", "v_micro", "level_micro", "trend_micro",
        "season_micro")
      .orderBy(col("series"), col("h"))
  }

  /** [[holtWinters]] on the events table. */
  def eventHoltWinters(spark: SparkSession, dir: String): DataFrame =
    holtWinters(Tables.events(spark, dir))

  /** Deseasonalized anomaly detection: [[anomalyMad]]'s robust scorer
    * over [[holtWinters]] FITTED residuals `v − level − season` instead
    * of raw values — the composition that stops the daily wave from
    * being the anomaly: on a diurnal metric, raw-value MAD flags every
    * peak hour; the residual scorer flags only departures from the
    * series' own learned level+season. Residuals are exact integer
    * micro (three longs subtracted); the med/MAD pair comes from the
    * same exact interpolated percentiles as [[madStats]], and the one
    * fp division per flagged row is the identical IEEE expression in
    * the oracle.
    *
    * Scale shape: [[holtWinters]]'s two shuffles, then two grouped
    * percentile passes over the O(series × hours) bucket table and a
    * broadcast join-back — one stats row per series, never a
    * self-join.
    */
  def anomalyDeseasonal(spark: SparkSession, dir: String,
                        cut: Double = 4.0): DataFrame =
    anomalyDeseasonalFrom(Tables.events(spark, dir), cut)

  /** The forecast table [[holtWinters]] exists to produce: per series,
    * the next `horizon` bucket predictions `level + k·trend +
    * season[slot]` from the series' final fitted state — the capacity/
    * alerting baseline for the next day. The final (level, trend) pair
    * is one max-struct per series; each slot's latest seasonal estimate
    * is one max-struct per (series, slot) — both map-side-combinable
    * aggregates over the smoother's output, no window re-sort. Slots
    * never observed (a series younger than one period) forecast with
    * seasonal 0, the same neutral the smoother itself warmed up from.
    * All arithmetic stays exact integer micro.
    */
  def holtWintersForecast(spark: SparkSession, dir: String,
                          horizon: Int = 24, period: Int = 24): DataFrame =
    holtWintersForecastFrom(eventHoltWinters(spark, dir), horizon, period)

  /** [[holtWintersForecast]] over an already-fitted [[holtWinters]]
    * output frame. */
  def holtWintersForecastFrom(hw: DataFrame, horizon: Int = 24,
                              period: Int = 24): DataFrame = {
    require(horizon >= 1 && horizon <= 8784, s"horizon in [1,8784]")
    val lastState = hw.groupBy(col("series"))
      .agg(max(struct(col("h"), col("level_micro"), col("trend_micro")))
        .as("st"))
      .select(col("series"), col("st.h").as("h0"),
        col("st.level_micro").as("l"), col("st.trend_micro").as("b"))
    val lastSeason = hw
      .groupBy(col("series"), (col("h") % period).as("slot"))
      .agg(max(struct(col("h"), col("season_micro"))).getField("season_micro")
        .as("s"))
    lastState
      .select(col("series"), col("h0"), col("l"), col("b"),
        explode(expr(s"sequence(1L, ${horizon}L)")).as("k"))
      .withColumn("h", col("h0") + col("k"))
      .withColumn("slot", col("h") % period)
      .join(lastSeason, Seq("series", "slot"), "left")
      .select(col("series"), col("h"), col("k"),
        (col("l") + col("k") * col("b") + coalesce(col("s"), lit(0L)))
          .as("forecast_micro"))
      .orderBy(col("series"), col("h"))
  }

  /** [[anomalyDeseasonal]] over any (event_type, ts, value) frame. */
  def anomalyDeseasonalFrom(ev0: DataFrame, cut: Double = 4.0): DataFrame = {
    val resid = holtWinters(ev0)
      .select(col("series"), col("h"),
        (col("v_micro") - col("level_micro") - col("season_micro")).as("r"))
    val stats = madStats(resid, col("series"), col("r"))
      .withColumnRenamed("k", "series")
    resid.join(broadcast(stats), "series")
      .filter(col("mad") > 0 && abs(col("r") - col("med")) > col("mad") * lit(cut))
      .select(col("series"), col("h"), col("r").as("resid_micro"),
        round(abs(col("r") - col("med")) / col("mad"), 4).as("mad_score"))
      .orderBy(col("series"), col("h"))
  }

  /** Single changepoint per series (AMOC — at-most-one-change): the
    * split position maximizing the cumulative deviation from the
    * series' own global mean, `|S_t·n − S·t|` — the point where the
    * before/after means diverge hardest. This is the level-shift
    * detector a pipeline runs on a metric stream before trusting a
    * drift gate: KS (28ai) says the DISTRIBUTION moved; this says WHEN
    * the level moved. The statistic is the unweighted CUSUM supremum:
    * S_t·n − S·t = t(n−t)·(mean_left − mean_right), so the argmax is
    * the max mean-gap split with the variance-stabilizing weight left
    * out — the variant that stays in EXACT integers end-to-end
    * (micro-mean buckets bounded by value scale and span keep
    * |D_t| < 10¹⁵ — long-safe with headroom).
    *
    * Determinism: D_t is exact integer arithmetic; the argmax
    * tie-breaks to the earliest split; the map-side-combinable
    * max(struct) is total because the position is unique per row. The
    * two output means are the only divisions, truncating on exact
    * integers — any engine agrees bit-for-bit.
    *
    * Scale shape: one O(events) bucketing shuffle; the prefix sum and
    * argmax run per-series on the O(series × hours) bucket table (the
    * acf/gap-fill discipline) — the per-series window is bounded by
    * retention span, and the final agg ships one struct per series.
    */
  def changepoint(ev0: DataFrame, bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))
    val stats = hourly.groupBy(col("series"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val w = Window.partitionBy(col("series")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("t", row_number().over(
        Window.partitionBy(col("series")).orderBy(col("h"))).cast("long"))
      .withColumn("st", sum(col("x")).over(w))
      .join(broadcast(stats), "series")
      .filter(col("t") < col("n"))
      .withColumn("d_num", abs(col("st") * col("n") - col("s") * col("t")))
      .groupBy(col("series"))
      .agg(max(struct(col("d_num"), (-col("t")).as("nt"), col("h").as("sh"),
        col("st"), col("n").as("sn"), col("s").as("ss"))).as("m"))
      .select(col("series"), col("m.sn").as("n"), (-col("m.nt")).as("t"),
        col("m.sh").as("split_h"), col("m.d_num").as("d_num"),
        expr("m.st div (-m.nt)").as("mean_l_micro"),
        expr("(m.ss - m.st) div (m.sn + m.nt)").as("mean_r_micro"))
      .orderBy(col("series"))
  }

  /** [[changepoint]] on the events table. */
  def eventChangepoint(spark: SparkSession, dir: String): DataFrame =
    changepoint(Tables.events(spark, dir))

  /** Per-bucket one-sided CUSUM statistic per series — the ONLINE twin
    * of [[changepoint]] (AMOC finds a shift after the fact; CUSUM is the
    * sequential detector that raises while it happens). Baseline μ₀ is
    * the mean of the series' first `refBuckets` hourly buckets (CAUSAL —
    * computable by a stream, unlike the global mean), slack
    * k = μ₀·slackPermille div 1000, and the classic recurrence
    * `s_t = max(0, s_{t−1} + x_t − μ₀ − k)` is evaluated in closed form
    * as `P_t − least(0, min_{j≤t} P_j)` over the drift prefix sum P —
    * two window passes, NO sequential fold, exact integers end-to-end
    * (the recurrence and the closed form are algebraically identical;
    * the spec checks them against each other). Output: one row per
    * post-baseline bucket with the running statistic — what a monitor
    * thresholds; `Monitor.cusumStream` replays it live bucket-by-bucket.
    *
    * Scale shape: the acf/changepoint discipline — one O(events)
    * bucketing shuffle, then per-series windows on the O(series × hours)
    * bucket table; the baseline is a filtered 1-row-per-series agg
    * broadcast back.
    */
  def cusum(ev0: DataFrame, refBuckets: Int = 24, slackPermille: Long = 50L,
            bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    require(refBuckets >= 1 && slackPermille >= 0)
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))
      .withColumn("t", row_number().over(
        Window.partitionBy(col("series")).orderBy(col("h"))).cast("long"))
    val base = hourly.filter(col("t") <= refBuckets)
      .groupBy(col("series"))
      .agg(count(lit(1)).as("nb"), sum(col("x")).as("sb"))
      .filter(col("nb") === refBuckets.toLong)
      .select(col("series"), expr(s"sb div ${refBuckets}L").as("mu0"))
    val run = Window.partitionBy(col("series")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(base), "series")
      .filter(col("t") > refBuckets)
      .withColumn("d", col("x") - col("mu0") -
        expr(s"mu0 * ${slackPermille}L div 1000L"))
      .withColumn("p", sum(col("d")).over(run))
      .withColumn("s_micro", col("p") - least(lit(0L), min(col("p")).over(run)))
      .select(col("series"), col("h"), col("x").as("x_micro"),
        col("mu0").as("mu0_micro"), col("s_micro"))
      .orderBy(col("series"), col("h"))
  }

  /** [[cusum]] on the events table. */
  def eventCusum(spark: SparkSession, dir: String): DataFrame =
    cusum(Tables.events(spark, dir))

  /** Per-(series, hour-bucket) PARTIAL sums — the mergeable sufficient
    * statistic of the whole ts family's bucket table (sum and count are
    * algebraic, so per-batch partials merge losslessly via
    * [[hourlyMerge]]; the exact-integer bucket means come out identical
    * to a single-pass recompute). The persisted form
    * `Monitor.maintainHourlyBuckets` appends per micro-batch.
    */
  def hourlyPartial(ev0: DataFrame, bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    ev0.select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
  }

  /** Merge bucket partials and finish the exact-integer bucket mean. */
  def hourlyMerge(partials: DataFrame): DataFrame =
    partials.groupBy(col("series"), col("h"))
      .agg(sum(col("sv")).as("sv"), sum(col("cnt")).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))

  /** [[seasonalProfile]] from an already-bucketed (series, h, x) table —
    * the merge-on-read epilogue over a maintained bucket log.
    */
  def seasonalFromHourly(hourly: DataFrame, periodBuckets: Int = 24): DataFrame = {
    require(periodBuckets >= 2)
    val slots = hourly
      .groupBy(col("series"), (col("h") % periodBuckets).as("slot"))
      .agg(count(lit(1)).as("n_slot"), sum(col("x")).as("sx"))
      .select(col("series"), col("slot"), col("n_slot"),
        expr("sx div n_slot").as("slot_mean_micro"))
    val overall = hourly.groupBy(col("series"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .select(col("series"), expr("s div n").as("series_mean_micro"))
    slots.join(broadcast(overall), "series")
      .select(col("series"), col("slot"), col("n_slot"),
        col("slot_mean_micro"), col("series_mean_micro"),
        (col("slot_mean_micro") - col("series_mean_micro")).as("seasonal_micro"))
      .orderBy(col("series"), col("slot"))
  }

  /** Hour-of-day seasonal profile per series: the additive seasonal
    * index `m_s − μ` (mean of the hour-of-day slot minus the series
    * mean) every seasonal-naive forecast, capacity plan, and
    * "is 3am traffic supposed to be this low" check starts from — and
    * the deseasonalizing offset the drift detectors (28bc/28bd) want
    * applied first on strongly diurnal metrics. Slot means and the
    * series mean are exact integer micro divisions; the index is their
    * difference — integer end-to-end, engine-exact.
    *
    * Scale shape: the bucket-table discipline (one O(events) shuffle);
    * the profile itself is two tiny grouped aggregates (series × 24 and
    * series) joined via broadcast — output is 24 rows per series at any
    * corpus size. Composed as partial → merge → epilogue so a
    * maintained bucket log (48k-style) serves the same epilogue
    * incrementally.
    */
  def seasonalProfile(ev0: DataFrame, periodBuckets: Int = 24,
                      bucketSec: Long = 3600L): DataFrame =
    seasonalFromHourly(hourlyMerge(hourlyPartial(ev0, bucketSec)), periodBuckets)

  /** [[seasonalProfile]] on the events table. */
  def eventSeasonalProfile(spark: SparkSession, dir: String): DataFrame =
    seasonalProfile(Tables.events(spark, dir))

  /** Interval-union length per key (total COVERED time from overlapping
    * intervals — billable device uptime, concurrent-capture coverage):
    * the classic sweep expressed as one window pass — order intervals by
    * start, carry the running max end, and each interval contributes
    * `max(0, end − max(start, prev running-max end))` — overlaps counted
    * once, exact integer seconds, no self-join (the naive overlap
    * pairing is per-key quadratic; the sweep is per-key linear).
    *
    * `iv` needs (key, start_sec, end_sec); a degenerate row with
    * end < start contributes 0 through the same clamp (it still counts
    * in n_intervals). One exchange on the key serves sort and sweep.
    */
  def intervalUnionLength(iv: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("start_sec"), col("end_sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    iv.select(col("key"), col("start_sec"), col("end_sec"))
      .withColumn("prev_max_end", max(col("end_sec")).over(w))
      .withColumn("contrib", greatest(lit(0L),
        col("end_sec") - greatest(col("start_sec"),
          coalesce(col("prev_max_end"), col("start_sec")))))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("contrib")).as("covered_sec"))
      .orderBy(col("key"))
  }

  /** [[intervalUnionLength]] over per-event activity windows: each event
    * opens an interval of `value` minutes — per-user total active
    * coverage with bursts counted once.
    */
  def eventBusyTime(spark: SparkSession, dir: String): DataFrame = {
    import graft.model.Documents
    intervalUnionLength(Tables.events(spark, dir)
      .select(col("user_id").as("key"),
        Documents.tsSec(col("ts")).as("start_sec"),
        (Documents.tsSec(col("ts")) +
          expr("cast(round(value * 60.0D) as bigint)")).as("end_sec")))
  }

  /** Motif census (SAX-style): the most frequent discretized `width`-step
    * shapes across all series' hourly buckets — "what does this corpus of
    * metrics keep doing" (ramp-ups, sawtooths, plateaus) without any
    * per-pattern query. Each hour-to-hour step discretizes to U/D/F by an
    * integer deadband test (`|Δ|·1000 > |prev|·permille` — no division,
    * engine-exact); a window's shape is the concatenated symbol string,
    * windows spanning bucket gaps are dropped (lead-contiguity check, no
    * fabricated steps), and the census counts occurrences and distinct
    * series per shape with a deterministic first-occurrence witness.
    *
    * Scale shape: one O(events) bucketing shuffle, then everything runs
    * on the O(series × hours) bucket table — symbols and shapes are
    * window `lead`s over the per-series sort the bucket table already
    * has, and the census is one map-side-combined groupBy on shape.
    * Top-k is TakeOrdered. No collects, no cross-series state.
    */
  def motifs(ev0: DataFrame, width: Int = 4, deadbandPermille: Long = 20L,
             k: Int = 20, bucketSec: Long = 3600L): DataFrame =
    motifsFromHourly(hourlyMerge(hourlyPartial(ev0, bucketSec)),
      width, deadbandPermille, k)

  /** [[motifs]] from an already-bucketed (series, h, x) table — the
    * merge-on-read epilogue over a maintained bucket log (48w), like
    * [[seasonalFromHourly]]: the census stays current at the ingest door
    * without re-bucketing raw events.
    */
  def motifsFromHourly(hourly: DataFrame, width: Int = 4,
                       deadbandPermille: Long = 20L, k: Int = 20): DataFrame = {
    require(width >= 2 && width <= 24, s"width in [2,24], got $width")
    val w = Window.partitionBy(col("series")).orderBy(col("h"))
    // step symbol for (h → h+1); null when the next bucket isn't h+1
    val sym = hourly
      .withColumn("h1", lead(col("h"), 1).over(w))
      .withColumn("x1", lead(col("x"), 1).over(w))
      .withColumn("sym",
        // the tail bucket has no next step: NULL, never a fabricated 'F'
        when(col("h1").isNull || col("h1") =!= col("h") + 1L,
          lit(null).cast("string"))
          .when((col("x1") - col("x")) * 1000L > abs(col("x")) * deadbandPermille, "U")
          .when((col("x") - col("x1")) * 1000L > abs(col("x")) * deadbandPermille, "D")
          .otherwise("F"))
    // shape = width consecutive step symbols starting at h; any gap or
    // series tail inside the window nulls a lead and drops the row
    val leads = (0 until width).map {
      case 0 => col("sym")
      case j => when(lead(col("h"), j).over(w) === col("h") + j,
        lead(col("sym"), j).over(w))
    }
    sym.withColumn("shape", concat(leads: _*))
      .filter(col("shape").isNotNull && length(col("shape")) === width)
      .groupBy(col("shape"), col("series"))
      .agg(count(lit(1)).as("n"), min(col("h")).as("first_h"))
      .groupBy(col("shape"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_series"),
        min(struct(col("series"), col("first_h"))).as("w0"))
      .select(col("shape"), col("n"), col("n_series"),
        col("w0.series").as("first_series"), col("w0.first_h").as("first_h"))
      .orderBy(col("n").desc, col("shape"))
      .limit(k)
  }

  /** [[motifs]] on the events table. */
  def eventMotifs(spark: SparkSession, dir: String): DataFrame =
    motifs(Tables.events(spark, dir))

  /** RFM segmentation (recency / frequency / monetary quintiles) — the
    * classic customer-value census every curation or marketing pass
    * starts from. Exact integers end-to-end: recency = epoch seconds of
    * the last order, monetary = exact decimal cents; each dimension
    * scores as an ASCENDING `ntile(5)` with a deterministic
    * (value, custkey) tie order, so the quintile labels are engine-exact.
    *
    * Scale shape: the only fact-scale work is one map-side-combined
    * groupBy to the customer aggregate (3 columns — ~1e7 rows / tens of
    * MB at sf100); each dimension then scores through
    * [[Rank.rangedNtile]] — a range-partitioned distributed rank +
    * broadcast offsets, exactly SQL `ntile(5)` rank-for-rank — so no
    * single-task window touches the customer aggregate even if the
    * customer dimension itself outgrows one task.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val agg = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).cast("long").as("last_order_sec"),
        count(lit(1)).as("frequency"),
        (sum(money(col("o_totalprice"))) * 100).cast("long").as("monetary_cents"))
    def nt(df: DataFrame, c: String, out: String) =
      Rank.rangedNtile(df, 5, Seq(col(c), col("custkey")), out)
        .withColumn(out, col(out).cast("long"))
    nt(nt(nt(agg, "last_order_sec", "r_score"),
        "frequency", "f_score"),
        "monetary_cents", "m_score")
      .orderBy("custkey")
  }

  /** [[rfmSegments]] on the orders table. */
  def custRfm(spark: SparkSession, dir: String): DataFrame =
    rfmSegments(Tables.orders(spark, dir))

  /** DataFrame form of [[cohortRetention]]: `ev` needs (user_id, day). */
  def retention(ev: DataFrame): DataFrame = {
    val firstTouch = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    ev.join(firstTouch, "user_id")
      .select(col("user_id"),
        floor(col("first_day") / 7).as("cohort_week"),
        floor((col("day") - col("first_day")) / 7).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Exact percentile-rank normalization per group (the quantile
    * transform — the feature-engineering step that makes heavy-tailed
    * metrics comparable across groups before thresholds, curricula, or
    * model features touch them): each row maps to
    * `1000·(rank−1) div (n−1)` over the total (value, id) order within
    * its group — integer permille, engine-exact, no interpolation;
    * single-row groups pin to 0 by CASE. One rank window per group
    * (groups are the parallelism unit — the 28f/28bt discipline; the
    * 42av histogram-rank ntile is the heavy-single-group fallback).
    */
  def percentRank(ev0: DataFrame): DataFrame = {
    val base = ev0.select(col("event_type"), col("event_id"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .filter(col("vm").isNotNull)
    base
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("vm"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("event_id"), col("vm"),
        when(col("n") > 1, expr("(1000 * (rk - 1)) div (n - 1)"))
          .otherwise(lit(0L)).as("pr_permille"))
  }

  /** [[percentRank]] on the events table. */
  def eventPercentRank(spark: SparkSession, dir: String): DataFrame =
    percentRank(Tables.events(spark, dir))

  /** Benford first-digit audit over order totals — the classic
    * fabricated-data / broken-feed detector: naturally-occurring
    * multi-scale amounts follow log₁₀(1 + 1/d) per leading digit d, so
    * a feed whose digit profile departs hard from that curve was
    * generated, truncated, or corrupted upstream. Counts are exact;
    * observed shares are truncating permille; the expected shares are
    * the Benford constants as integer permille literals (301, 176, 125,
    * 97, 79, 67, 58, 51, 46 — no runtime log, no libm divergence);
    * `dev_permille` is the signed gap. One scan, one 9-row
    * map-combined aggregate — free at any scale.
    */
  def benfordAudit(ord: DataFrame): DataFrame = {
    val expected = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    val expCase = expected.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}L" }
      .mkString("CASE digit ", " ", " END")
    ord
      .select(substring(money(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
      .select(col("digit"), col("n"),
        expr("(1000 * n) div n_tot").as("observed_permille"),
        expr(expCase).as("expected_permille"),
        (expr("(1000 * n) div n_tot") - expr(expCase)).as("dev_permille"))
      .orderBy("digit")
  }

  /** [[benfordAudit]] on the orders table. */
  def orderBenford(spark: SparkSession, dir: String): DataFrame =
    benfordAudit(Tables.orders(spark, dir))

  /** Revenue concentration per nation — the exact Gini coefficient over
    * customer revenue (the inequality census behind "is this market a
    * few whales or a broad base", the same shape data teams run on
    * per-source token counts before fixing mixture weights): customers
    * rank ascending by (revenue, custkey) within their nation, and
    * `G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)` comes out in milli from
    * three exact integer sums. Zero-order customers count — a market
    * where half the accounts never bought IS concentrated, and
    * excluding them would hide exactly that.
    *
    * Scale shape: revenue pre-aggregates to the O(customers) table
    * before anything sorts (map-combined groupBy over orders); the rank
    * window partitions by nation — the 28bh discipline. Σ i·x is
    * long-safe while customers-per-nation × max-revenue-cents stays
    * under 9·10¹⁸ (~10⁶ customers at ~$10M each); past that the milli
    * trick from 28ab applies.
    */
  def revenueGini(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_custkey"),
            (money(col("o_totalprice")) * 100).cast("long").as("cents")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(coalesce(sum(col("cents")), lit(0L)).as("rev"))
      .select(col("c_nationkey").as("grp"), col("c_custkey").as("id"),
        col("rev"))
    giniByGroup(rev)
      .withColumnRenamed("grp", "nationkey")
      .withColumnRenamed("n", "n_cust")
      .withColumnRenamed("total", "total_cents")
      .orderBy("nationkey")
  }

  /** [[revenueGini]]'s core over any (grp, id, rev) table: exact milli
    * Gini from the three rank-weighted integer sums.
    */
  def giniByGroup(rev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    rev.withColumn("i", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("rev"), col("id"))))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("total"),
        sum(col("i") * col("rev")).as("wsum"))
      .select(col("grp"), col("n"), col("total"),
        when(col("total") > 0,
          expr("(2000 * wsum - 1000 * (n + 1) * total)" +
            " div (n * total)")).as("gini_milli"))
  }

  /** Weekly top movers — the "what changed the most" triage view over
    * the metric streams: weekly sums per series (epoch-day div 7 — pure
    * integer bucketing, no engine week-truncation), week-over-week
    * delta by one lag, ranked by absolute move. Gap weeks break the
    * chain honestly (delta only between CONSECUTIVE weeks — a series
    * silent for a month doesn't fabricate a cliff). The permille change
    * is CASE-guarded on a positive previous week; integer end-to-end.
    *
    * Scale shape: one map-combined bucketing shuffle to O(series ×
    * weeks) rows, one per-series lag window over that tiny table, and a
    * TakeOrdered top-k — the 28ag/28bq bucket-table discipline.
    */
  def topMovers(ev0: DataFrame, k: Int = 20): DataFrame = {
    import graft.model.Documents
    val weekly = ev0
      .select(col("event_type").as("series"),
        ((Documents.tsSec(col("ts")) / 86400L).cast("long") / 7L)
          .cast("long").as("wk"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("wk"))
      .agg(sum(col("vm")).as("wsum"))
    val w = Window.partitionBy(col("series")).orderBy(col("wk"))
    weekly
      .withColumn("prev_wk", lag(col("wk"), 1).over(w))
      .withColumn("prev_sum", lag(col("wsum"), 1).over(w))
      .filter(col("prev_wk") === col("wk") - 1)
      .select(col("series"), col("wk"), col("wsum"), col("prev_sum"),
        (col("wsum") - col("prev_sum")).as("delta_micro"),
        // divide non-negative operands only: Spark's `div` truncates
        // toward zero while the oracle's `//` floors — they agree iff
        // the numerator is kept non-negative and the sign re-applied
        when(col("prev_sum") > 0,
          expr("case when wsum >= prev_sum" +
            " then (1000 * (wsum - prev_sum)) div prev_sum" +
            " else -((1000 * (prev_sum - wsum)) div prev_sum) end"))
          .as("change_permille"))
      .orderBy(abs(col("delta_micro")).desc, col("series"), col("wk"))
      .limit(k)
  }

  /** [[topMovers]] on the events table. */
  def eventTopMovers(spark: SparkSession, dir: String): DataFrame =
    topMovers(Tables.events(spark, dir))

  /** Trimmed and winsorized means per group — the robust location
    * estimates between the plain mean (outlier-hostage) and the median
    * (throws away 100·(1−ε)% of the data): drop (trimmed) or clamp
    * (winsorized) the lowest/highest `trimPermille` fraction of ROWS per
    * group and average the rest. What a curation pass reports when a
    * metric has heavy tails the mean would chase.
    *
    * Exactness: values in integer micro; the per-side trim count is the
    * INTEGER `(trim‰ · n) div 1000`; rank order is total — (value,
    * event_id) — so the kept set is engine-exact; trimmed sum/min/max
    * and the winsorized sum `trimmed_sum + cut·(v_lo + v_hi)` stay
    * integers, each mean one fixed integer division (micro) — no float
    * until the caller wants one.
    *
    * Scale shape: ONE rank window per group (parallel across groups —
    * same discipline as the exact grouped quantiles this sits beside)
    * then a map-combined aggregate. Heavy single groups at 100 TB want
    * the qsketch percentile path instead (28ab) — exact per-group order
    * statistics fundamentally sort the group; this op is the exact
    * variant, not a replacement for the sketch.
    */
  def trimmedMeans(ev0: DataFrame, trimPermille: Int = 100): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500,
      s"trimPermille in [0,500), got $trimPermille")
    val base = ev0.select(col("event_type"), col("event_id"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .filter(col("vm").isNotNull)
    val ranked = base.withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("vm"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("cut", expr(s"($trimPermille * n) div 1000"))
    val kept = ranked.filter(col("rk") > col("cut") && col("rk") <= col("n") - col("cut"))
    kept.groupBy(col("event_type"), col("n"), col("cut"))
      .agg(count(lit(1)).as("n_kept"), sum(col("vm")).as("tsum"),
        min(col("vm")).as("v_lo"), max(col("vm")).as("v_hi"))
      .select(col("event_type"), col("n"), col("cut"), col("n_kept"),
        expr("tsum div n_kept").as("trimmed_mean_micro"),
        expr("(tsum + cut * (v_lo + v_hi)) div n").as("winsorized_mean_micro"),
        col("v_lo").as("lo_clamp_micro"), col("v_hi").as("hi_clamp_micro"))
      .orderBy(col("event_type"))
  }

  /** [[trimmedMeans]] on the events table (10% per side). */
  def eventTrimmedMeans(spark: SparkSession, dir: String): DataFrame =
    trimmedMeans(Tables.events(spark, dir))

  /** Ordinary-least-squares trend line per series (slope, intercept, R²)
    * over the observed hourly buckets — the capacity-planning "is this
    * metric growing, and how fast" primitive, and the closed-form
    * regression [[acf]]'s persistence profile and [[holt]]'s smoother
    * feed into: one number per series for "micro-units per hour", with
    * R² saying how much of the variance the line explains.
    *
    * Exactness (the [[acf]] playbook): with n buckets, Σh = sh and
    * Σx = sx exact integers, the centered deviations are the INTEGERS
    * `u = n·h − sh` (hours) and `d = n·x − sx` (micro) — no float mean,
    * no division. Each cross/self product is a fixed-tree IEEE
    * expression micro-rounded to an integer BEFORE the (then exact,
    * associative) sum — `round(double(u)·double(d) / (n·n))` for the
    * covariance, `/ (n·n)` and `/ (1e6·n·n)` for the two variances —
    * every factor an exactly-representable long, one spelled
    * parenthesization, so partial-agg order can't move a bit and the
    * oracle replays the sums exactly. Slope/intercept/R² are then single
    * fixed divisions of those integers (NULL when the series has no
    * hour spread — both engines' CASE, never an engine-specific 0/0).
    *
    * Scale shape: one O(events) bucketing shuffle with map-side partial
    * agg, one broadcast of the O(series) stats row, one more grouped agg
    * over the O(series × hours) bucket table. The sufficient statistics
    * are five longs per series — map-combinable, mergeable across
    * increments (the streaming twin maintains exactly these sums), no
    * window, no per-series sort, no driver loop: 10⁶ series fan across
    * the cluster and a year of hourly buckets per series is just 8.8k
    * rows through an agg.
    */
  def olsTrend(ev0: DataFrame, bucketSec: Long = 3600L): DataFrame = {
    import graft.model.Documents
    val hourly = ev0
      .select(col("event_type").as("series"),
        (Documents.tsSec(col("ts")) / bucketSec).cast("long").as("h"),
        expr("cast(round(value * 1000000.0D) as bigint)").as("vm"))
      .groupBy(col("series"), col("h"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("series"), col("h"), expr("sv div cnt").as("x"))
    olsTrendFromBuckets(hourly)
  }

  /** [[olsTrend]]'s sums over an ALREADY-bucketed (series, h, x) table —
    * the bucket-log family convention, so the trend refreshes from the
    * streaming-maintained hourly log without re-scanning raw events.
    */
  def olsTrendFromBuckets(buckets: DataFrame): DataFrame = {
    val stats = buckets.groupBy(col("series"))
      .agg(count(lit(1)).as("n"), min(col("h")).as("h0"),
        sum(col("h")).as("sh"), sum(col("x")).as("sx"))
    val dev = buckets.join(broadcast(stats), "series")
      .select(col("series"), col("n"), col("h0"), col("sh"), col("sx"),
        (col("n") * col("h") - col("sh")).as("u"),
        (col("n") * col("x") - col("sx")).as("d"))
    dev.groupBy(col("series"), col("n"), col("h0"), col("sh"), col("sx"))
      .agg(
        sum(expr("cast(round(cast(u as double) * cast(d as double)" +
          " / (cast(n as double) * cast(n as double))) as bigint)")).as("cov_sum"),
        sum(expr("cast(round(cast(u as double) * cast(u as double)" +
          " / (cast(n as double) * cast(n as double))) as bigint)")).as("varh_sum"),
        sum(expr("cast(round(cast(d as double) * cast(d as double)" +
          " / (1000000.0D * n * n)) as bigint)")).as("varv_sum"))
      .select(col("series"), col("n"), col("h0"), col("cov_sum"),
        col("varh_sum"), col("varv_sum"),
        when(col("varh_sum") > 0,
          col("cov_sum").cast("double") / col("varh_sum").cast("double"))
          .as("slope_micro_per_h"),
        when(col("varh_sum") > 0,
          col("sx").cast("double") / col("n").cast("double")
            - (col("cov_sum").cast("double") / col("varh_sum").cast("double"))
              * ((col("sh") - col("n") * col("h0")).cast("double")
                 / col("n").cast("double")))
          .as("intercept_micro"),
        when(col("varh_sum") > 0 && col("varv_sum") > 0,
          (col("cov_sum").cast("double") / col("varh_sum").cast("double"))
            * (col("cov_sum").cast("double") / col("varv_sum").cast("double"))
            / lit(1000000.0d))
          .as("r2"))
      .orderBy(col("series"))
  }

  /** [[olsTrend]] on the events table. */
  def eventOlsTrend(spark: SparkSession, dir: String): DataFrame =
    olsTrend(Tables.events(spark, dir))

  /** Credited (conversion, touch) pairs for multi-touch attribution: every
    * touch event in the `windowUs` lookback strictly before a conversion by
    * the same user. This join is OUTPUT-BOUND — each surviving row is one
    * credited pair, i.e. exactly the deliverable — so its cost is the
    * answer's size, not a blow-up; the equality key is `user_id` (AQE
    * skew-splittable for power users) and the lookback bound caps pairs per
    * conversion by the user's touch rate × window, independent of history
    * length. `ev` needs (event_id, user_id, event_type, ts_us).
    */
  def attributionPairs(ev: DataFrame, windowUs: Long,
                       touchTypes: Seq[String],
                       convType: String): DataFrame = {
    require(windowUs > 0)
    require(touchTypes.nonEmpty && !touchTypes.contains(convType))
    val conv = ev.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts_us").as("conv_ts"))
    val touch = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts_us").as("touch_ts"))
    conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        col("conv_ts") - col("touch_ts") <= windowUs)
  }

  /** Multi-touch marketing attribution — the four standard credit models
    * over one pass of the credited pairs (reference-style capture streams
    * feed exactly this question: which upstream topic activity "caused"
    * each saved document). Per channel:
    *   - `conv_last` / `conv_first`: conversions whose latest / earliest
    *     in-window touch was this channel (last- and first-touch models);
    *   - `credit_linear_micro`: Σ over pairs of ⌊1e6 / n⌋ (equal split
    *     across the conversion's n touches);
    *   - `credit_decay_micro`: Σ of ⌊1e6·w / Σw⌋ with w = windowUs −
    *     Δt + 1 ∈ [1, windowUs] (linear time-decay — recency-weighted,
    *     integer-exact; exponential decay would drag libm `pow` into the
    *     hash compare for no modeling gain at this granularity).
    * All arithmetic is exact int64 (1e6·w ≤ 1e6·(windowUs+1) — overflow-
    * safe for windows up to ~106 days), so the result is engine-portable.
    *
    * Scale shape: the pairs join is output-bound (see
    * [[attributionPairs]]); both per-conversion windows — the unordered
    * n/Σw aggregates and the recency row_number — ride ONE
    * `partitionBy(conv_id)` spec, so Catalyst plans them over a single
    * exchange+sort on `conv_id` (an unbounded but hash-distributed key:
    * partitions hold many small groups, no single-task funnel).
    * First-touch rank is derived as `rl == n` rather than a second
    * opposite-order sort — touch_id tie-breaks make the order total, so
    * the reverse row_number is exactly n+1−rl.
    */
  def attribution(ev: DataFrame,
                  windowUs: Long = 7L * 24 * 3600 * 1000000L,
                  touchTypes: Seq[String] = Seq("click", "signup", "view"),
                  convType: String = "purchase"): DataFrame = {
    val byConv = Window.partitionBy(col("conv_id"))
    val recency = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    attributionPairs(ev, windowUs, touchTypes, convType)
      .withColumn("w", lit(windowUs) - (col("conv_ts") - col("touch_ts")) + lit(1L))
      .withColumn("n", count(lit(1)).over(byConv))
      .withColumn("sw", sum(col("w")).over(byConv))
      .withColumn("rl", row_number().over(recency).cast("long"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("touches"),
        sum(when(col("rl") === 1L, 1L).otherwise(0L)).as("conv_last"),
        sum(when(col("rl") === col("n"), 1L).otherwise(0L)).as("conv_first"),
        sum(expr("1000000L div n")).as("credit_linear_micro"),
        sum(expr("(1000000L * w) div sw")).as("credit_decay_micro"))
      .orderBy(col("channel"))
  }

  /** [[attribution]] on the events table: view/click/signup touches credit
    * purchase conversions inside a 7-day lookback (binding on this fixture:
    * the stream spans 30 days, so the window excludes real touches).
    */
  def eventAttribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")))

  /** First-order journey transition counts for [[markovAttribution]]:
    * one CONVERTING journey per conversion (its in-window touches in
    * time order, absorbed by CONV) and one NON-converting journey per
    * user with touches but no conversion at all (absorbed by NULLS) —
    * the chain needs both outcomes or P(conversion) is degenerately 1.
    * Emits the (src, dst, n) count matrix over states START / channels /
    * CONV / NULLS.
    *
    * Scale shape: the credited-pairs join is output-bound (see
    * [[attributionPairs]]); both the consecutive-touch lag and the
    * journey-terminal row ride ONE `partitionBy(jid)` window spec over
    * hash-distributed journey ids, and the final (src, dst) count is a
    * map-side-combined aggregate onto a ≤(C+2)² matrix.
    */
  def markovTransitions(ev: DataFrame,
                        windowUs: Long = 7L * 24 * 3600 * 1000000L,
                        touchTypes: Seq[String] = Seq("click", "signup", "view"),
                        convType: String = "purchase",
                        convValue: Double = 150.0): DataFrame = {
    require(windowUs > 0)
    require(touchTypes.nonEmpty && !touchTypes.contains(convType))
    val conv = ev.filter(col("event_type") === convType
        && col("value") >= convValue)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts_us").as("conv_ts"))
    val touch = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts_us").as("touch_ts"))
    val converting = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts")
        && col("conv_ts") - col("touch_ts") <= windowUs)
      .select(col("conv_id").as("jid"), col("channel"), col("touch_ts"),
        col("touch_id"), lit("CONV").as("absorb"))
    // journey ids live in disjoint keyspaces: conversions use the
    // (non-negative) event id, non-converters the -user_id-1 mirror
    val nonConverting = touch
      .join(conv.select(col("user_id")).distinct(), Seq("user_id"), "left_anti")
      .select((-col("user_id") - 1).as("jid"), col("channel"),
        col("touch_ts"), col("touch_id"), lit("NULLS").as("absorb"))
    val j = converting.unionByName(nonConverting)
    val byJ = Window.partitionBy(col("jid"))
      .orderBy(col("touch_ts"), col("touch_id"))
    val byJDesc = Window.partitionBy(col("jid"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    val steps = j
      .withColumn("src", coalesce(lag(col("channel"), 1).over(byJ), lit("START")))
      .withColumn("last", row_number().over(byJDesc) === 1)
    steps.select(col("src"), col("channel").as("dst"))
      .unionByName(steps.filter(col("last"))
        .select(col("channel").as("src"), col("absorb").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }

  /** Data-driven (Markov removal-effect) attribution — Anderl, Becker,
    * v. Wangenheim & Schumann 2014; the model-based answer to the
    * heuristic credit split [[attribution]] reports: fit the first-order
    * absorbing chain START → channels → {CONV, NULLS} by MLE (transition
    * probability = count ratio — which makes P(conv from START) equal
    * the empirical journey conversion rate, a built-in sanity anchor),
    * then credit channel c by how much conversion probability DISAPPEARS
    * when c is knocked out (every visit to c rerouted to NULLS, i.e.
    * p(c) pinned 0).
    *
    * The chain is tiny (C+2 states) but cyclic, so instead of a
    * truncated value iteration (self-loop mass makes convergence slow
    * and a bounded-K answer arbitrary) the absorption system
    * (I − Q)p = r is solved EXACTLY: rational Gaussian elimination over
    * BigInt fractions of the integer counts, with each removal variant a
    * rank-reduced resolve. Every reported number is therefore an exact
    * rational truncated to micro (the `div`/`//` convention) —
    * engine-portable with no libm, no iteration count, no convergence
    * tolerance. The oracle replays the same fractions as Cramer
    * determinants in HUGEINT. Built-in sanity anchor: with no knockout,
    * p_START is EXACTLY (converting journeys)/(all journeys).
    *
    * Per channel (sorted): `pconv_micro` (shared — the full-chain
    * conversion probability), `removed_micro` (with this channel knocked
    * out), `effect_micro` = pconv − removed (difference of the truncated
    * micros — documented), and `share_permille` = the truncating credit
    * split over Σ effects. NULL row values when the system is singular
    * (a closed channel clique that never reaches absorption); NULL share
    * when Σ effects ≤ 0.
    *
    * Scale shape: everything corpus-sized is [[markovTransitions]]; the
    * solve folds the ≤(C+2)²-row matrix in ONE typed group (the
    * flatMapGroups discipline — never a driver collect, never K joined
    * rounds over the cluster for a C×C system).
    */
  def markovAttribution(transitions: DataFrame): DataFrame = {
    val spark = transitions.sparkSession
    import spark.implicits._
    transitions.select(col("src").cast("string"), col("dst").cast("string"),
        col("n").cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_: Int, it: Iterator[(String, String, Long)]) =>
        markovSolveRows(it.toArray)
      }
      .toDF("channel", "pconv_micro", "removed_micro", "effect_micro",
        "share_permille")
      .orderBy(col("channel"))
  }

  /** [[markovAttribution]] on the events table: the same
    * view/click/signup → purchase journey definition as
    * [[eventAttribution]], with the HIGH-VALUE conversion (value ≥ 150,
    * the [[abLift]] convention) so both converting and non-converting
    * journeys exist and the chain has a real NULLS absorber. */
  def eventMarkovAttribution(spark: SparkSession, dir: String): DataFrame =
    markovAttribution(markovTransitions(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))))

  /** Exact BigInt fraction for [[markovSolveRows]]'s tiny linear
    * systems — normalized so equality/zero checks are structural. */
  private final case class Frac(n: BigInt, d: BigInt) {
    def +(o: Frac): Frac = Frac.norm(n * o.d + o.n * d, d * o.d)
    def -(o: Frac): Frac = Frac.norm(n * o.d - o.n * d, d * o.d)
    def *(o: Frac): Frac = Frac.norm(n * o.n, d * o.d)
    def /(o: Frac): Frac = Frac.norm(n * o.d, d * o.n)
    def isZero: Boolean = n.signum == 0
    /** this · 10⁶ truncated toward zero — the micro rendering (BigInt
      * `/` truncates exactly like Spark `div` and DuckDB `//`; the
      * rendered values here are probabilities, so ≥ 0 anyway). */
    def microTrunc: Long = (n * 1000000 / d).toLong
  }
  private object Frac {
    val zero: Frac = Frac(BigInt(0), BigInt(1))
    def apply(num: Long, den: Long): Frac = norm(BigInt(num), BigInt(den))
    def norm(n: BigInt, d: BigInt): Frac = {
      require(d.signum != 0)
      if (n.signum == 0) zero
      else {
        val s = d.signum
        val g = n.gcd(d)
        new Frac(n * s / g, d * s / g)
      }
    }
  }

  /** The per-group fold behind [[markovAttribution]]: exact rational
    * Gaussian elimination of the absorption system for the full chain
    * and each knocked-out variant. Input is the (src, dst, n) matrix;
    * output one row per channel. */
  private[ops] def markovSolveRows(cnt: Array[(String, String, Long)])
      : Iterator[(String, Option[Long], Option[Long], Option[Long], Option[Long])] = {
    val out = cnt.groupBy(_._1).map { case (s, rows) => s -> rows.map(_._3).sum }
    val channels = cnt.map(_._1).filter(_ != "START").distinct.sorted
    if (channels.isEmpty || !out.contains("START")) return Iterator.empty
    def c(a: String, b: String): Long =
      cnt.collectFirst { case (`a`, `b`, n) => n }.getOrElse(0L)
    // absorption probabilities of the chain restricted to `keep`:
    // (I − Q)p = r with Q, r the MLE count ratios; None when singular
    def solve(keep: IndexedSeq[String]): Option[Frac] = {
      val m = keep.size
      val a = Array.tabulate(m, m) { (i, j) =>
        Frac(if (i == j) 1L else 0L, 1L) -
          Frac(c(keep(i), keep(j)), out(keep(i)))
      }
      val b = Array.tabulate(m)(i => Frac(c(keep(i), "CONV"), out(keep(i))))
      for (p <- 0 until m) {
        val piv = (p until m).find(r => !a(r)(p).isZero).getOrElse(return None)
        if (piv != p) {
          val t = a(piv); a(piv) = a(p); a(p) = t
          val tb = b(piv); b(piv) = b(p); b(p) = tb
        }
        for (r <- 0 until m if r != p && !a(r)(p).isZero) {
          val f = a(r)(p) / a(p)(p)
          for (j <- p until m) a(r)(j) = a(r)(j) - f * a(p)(j)
          b(r) = b(r) - f * b(p)
        }
      }
      val p = keep.indices.map(i => b(i) / a(i)(i))
      // p_START folds the first-hop distribution over the kept channels
      Some(keep.indices.foldLeft(Frac.zero) { (acc, i) =>
        acc + Frac(c("START", keep(i)), out("START")) * p(i)
      })
    }
    val full = solve(channels.toIndexedSeq)
    val removed = channels.map(ch =>
      ch -> solve(channels.filterNot(_ == ch).toIndexedSeq)).toMap
    val fullMicro = full.map(_.microTrunc)
    val removedMicro = channels.map(ch => ch -> removed(ch).map(_.microTrunc)).toMap
    val effects = channels.map { ch =>
      ch -> (for (f <- fullMicro; r <- removedMicro(ch)) yield f - r)
    }.toMap
    val totalEffect = channels.flatMap(effects(_)).sum
    val allSolved = fullMicro.isDefined && channels.forall(removedMicro(_).isDefined)
    channels.iterator.map { ch =>
      val share =
        if (allSolved && totalEffect > 0L)
          effects(ch).map(e => 1000L * e / totalEffect) // truncating, = `div`
        else None
      (ch, fullMicro, removedMicro(ch), effects(ch), share)
    }
  }

  /** Kaplan–Meier survival curve per cohort — the censoring-correct
    * time-to-event analysis (churn, activation lag, device failure) that
    * a naive mean-of-durations gets wrong the moment the observation
    * window truncates anyone. `durations` needs (cohort string, dur_h
    * long, observed boolean): observed=false rows are right-censored at
    * `dur_h`. Per distinct duration t (ties: deaths counted before
    * censors leave, the standard convention): S ← S·(1 − d_t/n_t),
    * n ← n − d_t − c_t. Emits (cohort, dur_h, n_risk, d, c,
    * survival_micro).
    *
    * Determinism: the product folds in IEEE double in ascending-duration
    * order — a fixed sequential tree the oracle replays as a per-cohort
    * recursive CTE (the Holt discipline: the recurrence is inherently
    * sequential, so it runs as one typed `flatMapGroups` fold, never a
    * window that can't carry state and never a driver loop). Per-cohort
    * memory is O(distinct durations) — bounded by the observation span
    * in hours, not by cohort population (the groupBy collapses users
    * first); cohorts are the parallelism unit.
    */
  def survivalCurve(durations: DataFrame): DataFrame = {
    val spark = durations.sparkSession
    import spark.implicits._
    durations.groupBy(col("cohort"), col("dur_h"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
        sum(when(col("observed"), 0L).otherwise(1L)).as("c"))
      .select(col("cohort").cast("string"), col("dur_h").cast("long"),
        col("d").cast("long"), col("c").cast("long"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, Long, Long, Long)]) =>
        val rows = it.toArray.sortBy(_._2)
        var n = rows.map(r => r._3 + r._4).sum
        var s = 1.0
        rows.iterator.map { case (_, t, d, c) =>
          val atRisk = n
          s = s * (1.0 - d.toDouble / n.toDouble)
          n -= d + c
          (k, t, atRisk, d, c, math.round(s * 1000000.0))
        }
      }
      .toDF("cohort", "dur_h", "n_risk", "d", "c", "survival_micro")
      .orderBy(col("cohort"), col("dur_h"))
  }

  /** [[survivalCurve]] of signup→first-purchase on the events table:
    * event = a user's first purchase STRICTLY after their first signup,
    * duration in whole hours; users who never purchase after signing up
    * are right-censored at the corpus frontier (max event time). Cohort
    * = the user's signup epoch-week. The corpus frontier rides one
    * broadcast 1-row cross join; everything upstream of the fold is
    * user-level aggregates.
    */
  def eventSurvival(spark: SparkSession, dir: String): DataFrame =
    survivalCurve(signupDurations(spark, dir)
      .select(
        concat(lit("w"), expr("s div 604800000000").cast("string")).as("cohort"),
        col("dur_h"), col("observed")))

  /** Per-user signup→first-purchase durations, right-censored at the
    * corpus frontier — the shared feedstock of [[eventSurvival]]'s KM
    * curve and [[eventLogRank]]'s two-group test (ONE definition of the
    * time-to-event, so the curve and its significance stat can never
    * disagree about who converted when). Emits (user_id, s, dur_h,
    * observed); the frontier rides one broadcast 1-row cross join. */
  private def signupDurations(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val su = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts_us"))).as("s"))
      .filter(col("s").isNotNull)
    val pu = ev.filter(col("event_type") === "purchase")
      .join(su, Seq("user_id"))
      .filter(col("ts_us") > col("s"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("p"))
    val mx = ev.groupBy().agg(max(col("ts_us")).as("mt"))
    su.join(pu, Seq("user_id"), "left").crossJoin(broadcast(mx))
      .select(col("user_id"), col("s"),
        when(col("p").isNotNull, expr("(p - s) div 3600000000"))
          .otherwise(expr("(mt - s) div 3600000000")).as("dur_h"),
        col("p").isNotNull.as("observed"))
  }

  /** Log-rank test between two survival groups (Mantel 1966) — the
    * significance companion every [[survivalCurve]] comparison needs:
    * "are these two time-to-event curves the same?" asked properly,
    * censoring and all (comparing conversion fractions at an arbitrary
    * cutoff throws away the timing; comparing mean durations is wrong
    * under censoring). `du` needs (g ∈ {"A","B"}, dur_h, observed). At
    * each distinct event time: O−E term = d_A − d·n_A/n and the
    * hypergeometric variance d·(n_A/n)(1−n_A/n)(n−d)/(n−1), each a
    * fixed double tree over EXACT integer counts rounded to micro
    * immediately (the PSI per-term convention — the sums are then exact
    * and order-free); χ² = (ΣOE)²/ΣV one final double division. At-risk
    * counts come from the range-partitioned exclusive running sum —
    * never a single-task window; the initial-size row is a 1-row
    * broadcast under the plan-audit bound. NULL χ² when ΣV = 0 (no
    * comparable event times).
    */
  def logRank(du: DataFrame): DataFrame = {
    val ct = du.groupBy(col("dur_h"))
      .agg(
        sum(when(col("g") === "A" && col("observed"), 1L).otherwise(0L)).as("da"),
        sum(when(col("g") === "A" && !col("observed"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "B" && col("observed"), 1L).otherwise(0L)).as("db"),
        sum(when(col("g") === "B" && !col("observed"), 1L).otherwise(0L)).as("cb"))
      .withColumn("ra", col("da") + col("ca"))
      .withColumn("rb", col("db") + col("cb"))
    val tot = ct.agg(sum(col("ra")).as("na0"), sum(col("rb")).as("nb0"))
    val r = Rank.withRunningSum(
        Rank.withRunningSum(ct, Seq(col("dur_h")), "ra", "cra"),
        Seq(col("dur_h")), "rb", "crb")
      .crossJoin(broadcast(tot))
      .select(col("dur_h"), col("da"), col("db"),
        (col("na0") - (col("cra") - col("ra"))).as("na"),
        (col("nb0") - (col("crb") - col("rb"))).as("nb"),
        col("na0"), col("nb0"))
      .filter(col("da") + col("db") > 0L)
      .withColumn("d", col("da") + col("db"))
      .withColumn("n", col("na") + col("nb"))
    // a global agg (not a groupBy on the totals): an all-censored input
    // has ZERO event times but must still report its one row
    r.groupBy()
      .agg(
        coalesce(sum(col("da")), lit(0L)).as("events_a"),
        coalesce(sum(col("db")), lit(0L)).as("events_b"),
        coalesce(sum(expr(
          """cast(round(1000000.0D * (cast(da as double)
            | - cast(d as double) * cast(na as double) / cast(n as double)))
            | as bigint)""".stripMargin)), lit(0L)).as("oe_micro"),
        coalesce(sum(expr(
          """case when n > 1 then cast(round(1000000.0D * (cast(d as double)
            | * (cast(na as double) / cast(n as double))
            | * (1.0D - cast(na as double) / cast(n as double))
            | * (cast(n - d as double) / cast(n - 1 as double)))) as bigint)
            | else 0L end""".stripMargin)), lit(0L)).as("v_micro"))
      .crossJoin(broadcast(tot))
      .select(col("na0").as("n_a"), col("nb0").as("n_b"),
        col("events_a"), col("events_b"), col("oe_micro"), col("v_micro"),
        when(col("v_micro") > 0L, expr(
          """cast(round(cast(oe_micro as double) * cast(oe_micro as double)
            | / cast(v_micro as double)) as bigint)""".stripMargin))
          .as("chi2_micro"))
  }

  /** [[logRank]] of signup→first-purchase between the md5 experiment
    * arms — "did the treatment change time-to-conversion", the survival
    * half of the A/B readout family (same durations as the KM curve,
    * same variant split as [[abLift]]). */
  def eventLogRank(spark: SparkSession, dir: String): DataFrame =
    logRank(signupDurations(spark, dir)
      .select(
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
          .otherwise("B").as("g"),
        col("dur_h"), col("observed")))

  /** Per-user A/B cells shared by [[abLift]] and [[abChiSquare]] — ONE
    * definition of conversion and of the variant split, so the readout
    * and its significance stat can never disagree about who converted.
    * Variant = first hex nibble of md5(user_id) < '8' → "A" else "B"
    * (reproducible on any engine, no stored mapping, no RNG). Cents use
    * round(value·100) — the 2-dp source doubles sit within 1e-13 of
    * their decimal value, so round recovers the integer cents exactly
    * on both engines, where floor would drop a cent wherever the double
    * sits just below the decimal (0.29·100 = 28.999…96).
    */
  def abUserCells(ev: DataFrame, convValue: Double): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" && col("value") >= convValue,
          1L).otherwise(0L)).as("convs"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100.0D) as bigint)")).otherwise(0L))
          .as("cents"))

  /** The md5-nibble variant split, derived from the id alone — cells
    * never need to STORE the variant, so a maintained cells log stays
    * variant-agnostic and a re-split (new experiment epoch) is free. */
  private def withVariant(cells: DataFrame): DataFrame =
    cells.withColumn("variant",
      when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
        .otherwise("B"))

  /** The lift epilogue over (user_id, convs, cents) cells — shared by
    * the batch readout and the maintained-log view
    * ([[graft.streaming.Monitor.readAbLift]]), so the two can never
    * disagree; per-user cells are ADDITIVE, which is what makes the
    * streamed partials merge exactly.
    */
  def abLiftFromCells(cells: DataFrame): DataFrame =
    withVariant(cells).groupBy(col("variant"))
      .agg(count(lit(1)).as("users"),
        sum(when(col("convs") > 0L, 1L).otherwise(0L)).as("converters"),
        sum(col("cents")).as("revenue_cents"))
      .withColumn("conv_permille", expr("(1000L * converters) div users"))
      .select(col("variant"), col("users"), col("converters"),
        col("conv_permille"), col("revenue_cents"))
      .orderBy(col("variant"))

  /** A/B experiment readout over [[abUserCells]]. Per variant: exposed
    * users, converters (≥ 1 purchase at or above `convValue` — the
    * high-value-order conversion), truncating conversion permille, and
    * exact revenue cents.
    *
    * Scale shape: one groupBy(user_id) over the filtered purchase slice
    * (map-side partial agg → |users| rows), one groupBy(variant) → 2 rows.
    * No windows, no joins wider than user-level aggregates.
    */
  def abLift(ev: DataFrame, convValue: Double = 150.0): DataFrame =
    abLiftFromCells(abUserCells(ev, convValue))

  /** The experiment's significance readout: the 2×2 chi-square statistic
    * (converted × variant) in micro-units, computed over the exact integer
    * counts from [[abLift]]'s contingency table with ONE fixed double
    * parenthesization — `N·(ad−bc)²` overflows int64 at corpus scale
    * (counts ~1e4 already put the numerator at ~1e20), so the final ratio
    * runs in IEEE double with a left-associated tree that both engines
    * round identically (the 42ad/collocation-PMI precedent). Emits the
    * contingency cells too, so the stat is auditable from its own row.
    * One row; all upstream work is the user-level aggregate of [[abLift]].
    */
  def abChiSquare(ev: DataFrame, convValue: Double = 150.0): DataFrame =
    abChiSquareFromCells(abUserCells(ev, convValue))

  /** The chi-square epilogue over (user_id, convs, cents) cells — the
    * [[abLiftFromCells]] twin, shared with the maintained-log view. */
  def abChiSquareFromCells(cells0: DataFrame): DataFrame = {
    val cells = withVariant(cells0)
      .groupBy()
      .agg(
        sum(when(col("variant") === "A" && col("convs") > 0L, 1L).otherwise(0L)).as("a"),
        sum(when(col("variant") === "A" && col("convs") === 0L, 1L).otherwise(0L)).as("b"),
        sum(when(col("variant") === "B" && col("convs") > 0L, 1L).otherwise(0L)).as("c"),
        sum(when(col("variant") === "B" && col("convs") === 0L, 1L).otherwise(0L)).as("d"))
    // NULL (not ±inf→engine-divergent casts) when any margin is empty —
    // a degenerate experiment has no defined statistic.
    cells.select(col("a"), col("b"), col("c"), col("d"),
      expr("""case when a + b > 0 and c + d > 0 and a + c > 0 and b + d > 0
        then cast(round(
          cast(a + b + c + d as double) * cast(a*d - b*c as double) * cast(a*d - b*c as double)
          / cast(a + b as double) / cast(c + d as double)
          / cast(a + c as double) / cast(b + d as double) * 1000000.0D) as bigint)
        end""").as("chi2_micro"))
  }

  /** Welch's t-test on per-user revenue between the experiment arms —
    * the CONTINUOUS-metric significance readout beside [[abChiSquare]]'s
    * 2×2 proportion test (revenue per user is the metric most
    * experiments actually ship on, and its variances differ across arms
    * by construction — hence Welch, never pooled Student). Sufficient
    * statistics per arm are exact wide integers (n, Σx, Σx² in decimal —
    * cents² passes int64 at ~3e5-dollar users), the variance-over-n
    * terms g = (n·Σx² − (Σx)²)/(n²(n−1)) divide EXACT decimal num/den as
    * one correctly-rounded double division each (the chi-square
    * fixed-tree precedent; DuckDB mirrors in HUGEINT), then
    * t = (x̄_A − x̄_B)/√(g_A + g_B) and the Welch–Satterthwaite
    * df = (g_A+g_B)²/(g_A²/(n_A−1) + g_B²/(n_B−1)) evaluate under ONE
    * fixed double parenthesization. Means report as exact truncating
    * micro-cents. NULL stat on a degenerate experiment (an arm with
    * n < 2 or zero total variance) rather than an engine-divergent ±inf.
    *
    * Scale shape: everything is the [[abUserCells]] user-level aggregate
    * → one groupBy() row of six numbers; no windows, no joins.
    */
  def abTTestFromCells(cells0: DataFrame): DataFrame =
    withVariant(cells0)
      .groupBy()
      .agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("nb"),
        sum(when(col("variant") === "A", col("cents")).otherwise(0L)
          .cast("decimal(38,0)")).as("sxa"),
        sum(when(col("variant") === "B", col("cents")).otherwise(0L)
          .cast("decimal(38,0)")).as("sxb"),
        sum(when(col("variant") === "A",
          col("cents").cast("decimal(19,0)") * col("cents")).otherwise(lit(0)
          .cast("decimal(19,0)"))).as("sxxa"),
        sum(when(col("variant") === "B",
          col("cents").cast("decimal(19,0)") * col("cents")).otherwise(lit(0)
          .cast("decimal(19,0)"))).as("sxxb"))
      // n >= 2 inside the CASE: the n²(n−1) denominator is 0 below that
      // and ANSI errors on /0 where the stat is undefined anyway
      .withColumn("ga", expr(
        """case when na >= 2 then cast(na * sxxa - sxa * sxa as double)
          | / cast(cast(na as decimal(38,0)) * na * (na - 1) as double) end"""
          .stripMargin))
      .withColumn("gb", expr(
        """case when nb >= 2 then cast(nb * sxxb - sxb * sxb as double)
          | / cast(cast(nb as decimal(38,0)) * nb * (nb - 1) as double) end"""
          .stripMargin))
      .select(col("na"), col("nb"),
        // empty-arm guard: ANSI div errors on 0, and an empty arm's
        // mean is undefined anyway
        when(col("na") > 0L, expr("(1000000 * sxa) div na"))
          .as("mean_a_microcents"),
        when(col("nb") > 0L, expr("(1000000 * sxb) div nb"))
          .as("mean_b_microcents"),
        when(col("na") >= 2L && col("nb") >= 2L
            && col("ga") + col("gb") > 0d, expr(
          """cast(round(1000000.0D * (cast(sxa as double) / cast(na as double)
            |  - cast(sxb as double) / cast(nb as double))
            |  / sqrt(ga + gb)) as bigint)""".stripMargin)).as("t_micro"),
        when(col("na") >= 2L && col("nb") >= 2L
            && col("ga") + col("gb") > 0d, expr(
          """cast(round(1000.0D * (ga + gb) * (ga + gb)
            | / (ga * ga / cast(na - 1 as double)
            |    + gb * gb / cast(nb - 1 as double))) as bigint)"""
            .stripMargin)).as("df_milli"))

  /** [[abTTestFromCells]] over the events table (same cells, same
    * variant split as [[abLift]] — the readout and both significance
    * stats can never disagree about the population). */
  def abTTest(ev: DataFrame, convValue: Double = 150.0): DataFrame =
    abTTestFromCells(abUserCells(ev, convValue))

  /** Tie-corrected Mann–Whitney rank-sum z on per-user revenue — the
    * NONPARAMETRIC sibling of [[abTTestFromCells]] (per-user revenue is
    * zero-inflated and heavy-tailed; the rank test doesn't care). The
    * doubled U statistic folds exactly like the tie-aware AUC it shares
    * its mathematics with (U/(n_A·n_B) IS the AUC of "arm A beats arm
    * B"): per distinct cents value the (t, c_A, c_B) counts, the
    * strictly-below B prefix from the range-partitioned running sum,
    * U2 = Σ(2·below_B·c_A + c_A·c_B) in decimal. The normal
    * approximation uses the tie-corrected variance σ² = n_A·n_B/12 ·
    * ((N+1) − Σ(t³−t)/(N(N−1))) and z = (U − n_A·n_B/2)/σ under one
    * fixed double tree over the exact integers. `u2` ships as the
    * decimal's string rendering (the gini evidence convention). NULL z
    * when an arm is empty or every user ties (σ = 0).
    *
    * Scale shape: user cells → one groupBy(cents) (map-side combined,
    * O(distinct revenue values) rows) → the range-partitioned prefix →
    * one 1-row agg. No single-task window at any n.
    */
  def abMannWhitneyFromCells(cells0: DataFrame): DataFrame = {
    val g = withVariant(cells0)
      .groupBy(col("cents"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("cb"))
    Rank.withRunningSum(g, Seq(col("cents")), "cb", "cbb")
      .agg(
        sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum((col("cbb") - col("cb")).cast("decimal(19,0)")
            * col("ca").cast("decimal(19,0)") * lit(2)
          + col("ca").cast("decimal(19,0)") * col("cb").cast("decimal(19,0)"))
          .as("u2"),
        sum(col("t").cast("decimal(19,0)") * col("t") * col("t") - col("t"))
          .as("ties3"))
      // sig2num = N(N−1)(N+1) − Σ(t³−t): exact integer, 0 iff every
      // user ties (σ = 0 → NULL, never an engine NaN/±inf)
      .withColumn("sig2num", expr(
        """cast(na + nb as decimal(19,0)) * (na + nb - 1) * (na + nb + 1)
          | - ties3""".stripMargin))
      .select(col("na"), col("nb"), col("u2").cast("string").as("u2"),
        when(col("na") > 0L && col("nb") > 0L && col("sig2num") > 0, expr(
          // σ² as (double(na·nb) · double(sig2num)) / double(12·N(N−1)):
          // each cast converts an exact ≤10²⁷ decimal (correctly rounded
          // on both engines); the all-decimal product would pass 38
          // digits at ~10⁹ users
          """cast(round(1000000.0D *
            |  (cast(u2 - cast(na as decimal(19,0)) * nb as double) / 2.0D)
            |  / sqrt(cast(cast(na as decimal(19,0)) * nb as double)
            |         * cast(sig2num as double)
            |     / cast(12 * cast(na + nb as decimal(19,0)) * (na + nb - 1)
            |            as double))
            |  ) as bigint)""".stripMargin))
          .as("z_micro"))
  }

  /** [[abMannWhitneyFromCells]] over the events table. */
  def abMannWhitney(ev: DataFrame, convValue: Double = 150.0): DataFrame =
    abMannWhitneyFromCells(abUserCells(ev, convValue))

  /** CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    * WSDM 2013) — the standard trick that makes the SAME experiment
    * readable at a fraction of the sample: regress each user's
    * experiment-window revenue y on their PRE-experiment revenue x
    * (which no treatment can have touched) and judge the arms on the
    * adjusted metric y − θ(x − x̄) instead of y. θ = cov(x,y)/var(x)
    * from pooled exact integer sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy² in decimal), the covariance/variance numerators
    * cross-multiplied exact (n·Σxy − ΣxΣy etc.), θ and the adjusted
    * means single correctly-rounded double divisions of those exact
    * integers under one fixed parenthesization. Reports per arm: users,
    * the raw truncating mean, the adjusted mean (micro-cents), plus the
    * shared θ (micro) and the variance-reduction ratio ρ² =
    * cov²/(var_x·var_y) (permille) — the factor by which the adjusted
    * metric's variance shrinks. NULL adjustment when var(x) = 0 (no
    * pre-period signal — the raw readout is already the best one) or
    * var(y) = 0 for ρ².
    *
    * `splitTs` is the experiment-start boundary: purchases strictly
    * before it are the covariate window, at/after are the metric
    * window.
    *
    * Scale shape: one events scan → user-level cells (map-side
    * combined), one 1-row pooled agg broadcast back over the 2-row
    * per-variant agg. No windows, no user-level joins.
    */
  def abCuped(ev: DataFrame,
              splitTs: String = "2024-01-16 00:00:00"): DataFrame = {
    val cells = ev.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase"
            && col("ts") < lit(splitTs).cast("timestamp"),
          expr("cast(round(value * 100.0D) as bigint)")).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase"
            && col("ts") >= lit(splitTs).cast("timestamp"),
          expr("cast(round(value * 100.0D) as bigint)")).otherwise(0L))
          .as("y"))
    val v = withVariant(cells)
    val tot = v.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(19,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(19,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(19,0)") * col("y")).as("syy"))
      .select(col("n"), col("sx"),
        expr("n * sxy - sx * sy").as("cov_num"),
        expr("n * sxx - sx * sx").as("varx_num"),
        expr("n * syy - sy * sy").as("vary_num"))
    v.groupBy(col("variant"))
      .agg(count(lit(1)).as("nv"),
        sum(col("x").cast("decimal(38,0)")).as("sxv"),
        sum(col("y").cast("decimal(38,0)")).as("syv"))
      .crossJoin(broadcast(tot))
      .select(col("variant"), col("nv").as("users"),
        expr("(1000000 * syv) div nv").as("mean_microcents"),
        when(col("varx_num") > 0, expr(
          """cast(round(1000000.0D * (cast(syv as double) / cast(nv as double)
            |  - (cast(cov_num as double) / cast(varx_num as double))
            |    * (cast(sxv as double) / cast(nv as double)
            |       - cast(sx as double) / cast(n as double)))) as bigint)"""
            .stripMargin)).as("adj_mean_microcents"),
        when(col("varx_num") > 0, expr(
          """cast(round(1000000.0D * cast(cov_num as double)
            | / cast(varx_num as double)) as bigint)""".stripMargin))
          .as("theta_micro"),
        when(col("varx_num") > 0 && col("vary_num") > 0, expr(
          """cast(round(1000.0D * (cast(cov_num as double)
            |   * cast(cov_num as double))
            | / (cast(varx_num as double) * cast(vary_num as double)))
            | as bigint)""".stripMargin)).as("var_reduction_permille"))
      .orderBy(col("variant"))
  }

  /** Post-hoc power / minimum-detectable-effect readout of the
    * conversion experiment — the "was this test even big enough"
    * companion every [[abChiSquare]] reading needs: at the realized
    * sample sizes and pooled conversion rate, the smallest absolute
    * conversion-rate lift a two-sided α = 0.05 test would catch with
    * 80% power is MDE = (z_{0.975} + z_{0.80})·√(p̄(1−p̄)(1/n_A+1/n_B)).
    * The z constants are DATA-INDEPENDENT literals (the NDCG-discount
    * convention: spelled identically on both engines, bit-equal by
    * construction); p̄ and the observed lift are single double
    * divisions of exact integer counts, the MDE one fixed tree. Emits
    * the counts, observed lift, MDE (both micro), and the integer
    * verdict `powered` = |observed| ≥ MDE. NULL when an arm is empty or
    * p̄ is degenerate (0 or 1 — no variance to detect against).
    */
  def abPower(ev: DataFrame, convValue: Double = 150.0): DataFrame =
    withVariant(abUserCells(ev, convValue))
      .groupBy()
      .agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("nb"),
        sum(when(col("variant") === "A" && col("convs") > 0L, 1L)
          .otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === "B" && col("convs") > 0L, 1L)
          .otherwise(0L)).as("conv_b"))
      .withColumn("pbar", expr(
        """case when na + nb > 0
          | then cast(conv_a + conv_b as double) / cast(na + nb as double)
          | end""".stripMargin))
      .select(col("na"), col("nb"), col("conv_a"), col("conv_b"),
        when(col("na") > 0L && col("nb") > 0L, expr(
          """cast(round(1000000.0D * (cast(conv_a as double) / cast(na as double)
            | - cast(conv_b as double) / cast(nb as double))) as bigint)"""
            .stripMargin)).as("observed_lift_micro"),
        when(col("na") > 0L && col("nb") > 0L
            && col("pbar") > 0d && col("pbar") < 1d, expr(
          """cast(round(1000000.0D * (1.959963984540054D + 0.8416212335729143D)
            | * sqrt(pbar * (1.0D - pbar)
            |     * (1.0D / cast(na as double) + 1.0D / cast(nb as double))))
            | as bigint)""".stripMargin)).as("mde_micro"))
      .withColumn("powered",
        when(col("mde_micro").isNotNull,
          (abs(col("observed_lift_micro")) >= col("mde_micro")).cast("long")))

  /** DAU/MAU stickiness per calendar month — the canonical product-
    * analytics engagement ratio ("what share of the month's actives
    * show up on an average day"): stickiness = mean(DAU) / MAU, reported
    * as the exact truncating permille (1000·Σdau) div (days·mau) over
    * the days that HAVE data. Integer end-to-end.
    *
    * Scale shape: one distinct-(user, day) shuffle (map-side combined —
    * the same reduction every DAU query pays), then per-day and
    * per-month counts on the collapsed table; output is one row per
    * month at any corpus size. The month join broadcasts.
    */
  def dauMauStickiness(spark: SparkSession, dir: String): DataFrame =
    stickinessFromUserDays(userDays(Tables.events(spark, dir)))

  /** The distinct (user_id, day, mon) activity projection [[
    * dauMauStickiness]] reduces — also the ADDITIVE-by-distinct unit the
    * maintained engagement log stores (`Monitor.maintainEngagement`):
    * distinct is idempotent, so per-batch partials union + distinct to
    * exactly the batch projection no matter how ingest was split or
    * replayed.
    */
  def userDays(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("day"),
        ((year(col("ts")) - 2024) * 12 + month(col("ts")) - 1).as("mon"))
      .distinct()

  /** The stickiness epilogue over an already-collapsed distinct
    * (user_id, day, mon) table — shared by the batch path and the
    * maintained engagement log so both state the identical expression
    * tree.
    */
  def stickinessFromUserDays(ud: DataFrame): DataFrame = {
    val dau = ud.groupBy(col("mon"), col("day"))
      .agg(count(lit(1)).as("dau"))
    val mau = ud.select(col("mon"), col("user_id")).distinct()
      .groupBy(col("mon")).agg(count(lit(1)).as("mau"))
    dau.groupBy(col("mon"))
      .agg(count(lit(1)).as("days"), sum(col("dau")).as("dau_sum"))
      .join(broadcast(mau), "mon")
      .select(col("mon").cast("long").as("month_idx"), col("days"),
        col("mau"), col("dau_sum"),
        expr("(1000 * dau_sum) div (days * mau)").as("stickiness_permille"))
      .orderBy("month_idx")
  }

  /** Seasonal-strength diagnostic per series (the Hyndman & Athanasopoulos
    * FPP measure, simplified to the additive hour-of-day decomposition the
    * [[seasonalProfile]] family already states): with per-bucket means x,
    * seasonal fit s = slot_mean, and remainder r = x − s, strength =
    * max(0, 1 − Var(r)/Var(x)) — how much of the series' variance the
    * daily shape explains (≈0: no daily pattern, →1: the day IS the
    * series). EXACT integers end-to-end: both variances enter as the
    * scale-free sum-of-squared-deviations nΣd² − (Σd)² (same n, so the
    * ratio needs no division by n²), cross-multiplied in decimal;
    * strength_micro = 10⁶ − (10⁶·ssd_r) div ssd_x, clamped at 0; NULL
    * when the series is constant (ssd_x = 0 — no variance to explain).
    *
    * Scale shape: the bucket-table discipline (one O(events) shuffle into
    * ≤ hours-per-series rows), one broadcast join of the 24-row slot
    * means, two map-side-combined aggregates; output is one row per
    * series.
    */
  def seasonalStrength(spark: SparkSession, dir: String,
                       periodBuckets: Int = 24): DataFrame = {
    val hourly = hourlyMerge(hourlyPartial(Tables.events(spark, dir)))
    val slots = hourly
      .groupBy(col("series"), (col("h") % periodBuckets).as("slot"))
      .agg(expr("sum(x) div count(1)").as("slot_mean"))
    val joined = hourly.withColumn("slot", col("h") % periodBuckets)
      .join(broadcast(slots), Seq("series", "slot"))
      .select(col("series"), col("x"),
        (col("x") - col("slot_mean")).as("r"))
    joined.groupBy(col("series"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,0)")).as("sx"),
        sum(col("x").cast("decimal(28,0)") * col("x").cast("decimal(28,0)"))
          .as("sxx"),
        sum(col("r").cast("decimal(28,0)")).as("sr"),
        sum(col("r").cast("decimal(28,0)") * col("r").cast("decimal(28,0)"))
          .as("srr"))
      .select(col("series"), col("n"),
        expr("n * sxx - sx * sx").cast("decimal(38,0)").as("ssd_x"),
        expr("n * srr - sr * sr").cast("decimal(38,0)").as("ssd_r"))
      .select(col("series"), col("n"),
        col("ssd_x").cast("string").as("ssd_x"),
        col("ssd_r").cast("string").as("ssd_r"),
        when(col("ssd_x") > 0,
          greatest(lit(0L),
            lit(1000000L) - expr("(1000000 * ssd_r) div ssd_x")))
          .as("strength_micro"))
      .orderBy("series")
  }

  /** Per-user Shannon entropy of the event-type mix — the behavioral-
    * diversity number (a 0-entropy user does one thing; a max-entropy
    * user spreads evenly across the catalog), the per-key twin of the
    * corpus-level diversity signals in the 42 family. Each type's term
    * (c/n)·ln(n/c) rounds to micro IMMEDIATELY (the TextAnalysis ln
    * convention: measured 1-ulp JDK/libm divergence flips a rounded
    * term only with ~1e-9 odds), so the per-user sum over the BOUNDED
    * type domain is order-free integer addition; a single-type user
    * reads exactly 0 (ln 1 = 0).
    *
    * Scale shape: one map-side-combined (user, type) groupBy, a per-user
    * rollup, one equality join keyed on user — O(users·types) rows, no
    * windows.
    */
  def userTypeEntropy(spark: SparkSession, dir: String): DataFrame = {
    val ct = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val n = ct.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"))
    ct.join(n, "user_id")
      .select(col("user_id"), col("n"), col("n_types"),
        round(lit(1000000.0) * (col("c").cast("double") / col("n").cast("double"))
          * log(col("n").cast("double") / col("c").cast("double")))
          .cast("long").as("term"))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"), max(col("n_types")).as("n_types"),
        sum(col("term")).as("entropy_micro"))
      .orderBy("user_id")
  }

  /** Dynamic-time-warping distance between every pair of series'
    * day-part seasonal profiles (Berndt & Clifford 1994 — the classic
    * "do these two metrics follow the same daily shape, allowing a
    * phase shift" similarity; Euclidean on raw slots calls a 2-hour-
    * shifted twin dissimilar, DTW aligns it): the min-cost monotone
    * alignment path through the |a|×|b| grid with L1 cell cost
    * |a_i − b_j| on the exact integer micro slot means — the whole DP is
    * integer min-plus arithmetic, engine-exact.
    *
    * Scale shape: profiles are the [[seasonalProfile]] reduction (one
    * O(events) bucket shuffle ending in ≤`periodBuckets` rows per
    * series); the pair table is series² rows over a BOUNDED domain
    * (event types / topics — an intended small nested loop under the
    * plan-audit bound) and each pair's DP is O(periodBuckets²) inside
    * one task, embarrassingly parallel across pairs.
    */
  def dtwProfiles(spark: SparkSession, dir: String,
                  periodBuckets: Int = 8): DataFrame = {
    require(periodBuckets >= 2 && periodBuckets <= 64)
    val prof = seasonalProfile(Tables.events(spark, dir), periodBuckets,
        bucketSec = 86400L / periodBuckets)
      .select(col("series"), col("slot"), col("slot_mean_micro"))
    val vecs = prof.groupBy(col("series"))
      .agg(sort_array(collect_list(struct(col("slot"), col("slot_mean_micro"))))
        .as("sv"))
      .select(col("series"), expr("transform(sv, t -> t.slot_mean_micro)").as("v"))
    dtwPairs(vecs)
  }

  /** The pair fan-out + per-pair DP of [[dtwProfiles]], factored over an
    * explicit (series, v: array<long>) table so hand-built fixtures pin
    * the DP directly.
    */
  def dtwPairs(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.as("a").join(vecs.as("b"), col("a.series") < col("b.series"))
      .select(col("a.series").as("sa"), col("a.v").as("va"),
        col("b.series").as("sb"), col("b.v").as("vb"))
      .as[(String, Seq[Long], String, Seq[Long])]
      .map { case (sa, va, sb, vb) =>
        val n = va.length; val m = vb.length
        val inf = Long.MaxValue / 4
        val prev = Array.fill(m + 1)(inf); prev(0) = 0L
        val cur = new Array[Long](m + 1)
        var i = 1
        while (i <= n) {
          java.util.Arrays.fill(cur, inf)
          var j = 1
          while (j <= m) {
            val cost = math.abs(va(i - 1) - vb(j - 1))
            cur(j) = cost + math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
            j += 1
          }
          System.arraycopy(cur, 0, prev, 0, m + 1)
          i += 1
        }
        (sa, sb, n.toLong, m.toLong, prev(m))
      }
      .toDF("series_a", "series_b", "n_a", "n_b", "dtw_micro")
      .orderBy("series_a", "series_b")
  }
}
