package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** The canonical TPC-H Q1–Q22 shapes as `q301`–`q322` — the lingua-franca
  * query set a migrating user reaches for first (round-6 VERDICT item 4),
  * each re-expressed over the driver's TPC-H-ish tables with the repo's
  * exact-arithmetic discipline (decimal money sums, integer quantity
  * algebra, deterministic tie-breaks) so every one carries an exact
  * DuckDB oracle.
  *
  * The driver schema (FIXTURES.md §B) is TPC-H-ISH, not TPC-H: there is
  * no partsupp table and several columns are absent (l_shipmode,
  * l_commitdate/l_receiptdate, o_shippriority, c_phone, p_container,
  * comments). Each query keeps the canonical PLAN SHAPE (the joins,
  * aggregations, subqueries and semi/anti structure that make the query
  * its benchmark self) and substitutes the missing column with the
  * nearest available signal, documented per query:
  *  - supply cost / offers (Q2, Q11, Q16, Q20): derived from lineitem —
  *    the observed (part, supplier) shipments stand in for partsupp;
  *    unit cost = min shipped price-per-unit on an exact integer
  *    micro-cent grid.
  *  - late shipment (Q4, Q12, Q21): l_shipdate vs o_orderdate + delay
  *    stands in for commitdate/receiptdate.
  *  - o_shippriority (Q3): o_orderpriority rides in its place.
  *  - p_container (Q17, Q19): p_size bands.
  *  - c_phone country code (Q22): c_nationkey.
  *  - comment filters (Q13, Q16): priority / acctbal predicates.
  *
  * Scale notes, once for the family: every join is on the star-schema
  * keys (broadcastable dims — region/nation/supplier/part at catalog
  * size; AQE picks broadcast vs shuffle); aggregates are partial+final
  * hash aggs on group keys; the only windows/sorts are over group-sized
  * results (TakeOrderedAndProject for every LIMIT head). Scalar-subquery
  * thresholds (Q11, Q15, Q17, Q22) decorrelate to one-row broadcast
  * joins. Nothing here collects, nothing is quadratic.
  */
object TpchOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  private def ntz(c: Column): Column = c.cast("timestamp_ntz")
  private def tsLit(s: String): Column = lit(java.time.LocalDateTime.parse(s))

  /** Exact money discipline (Relational.dsum/drevenue twins). */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def davg(c: Column): Column = dsum(c) / count(lit(1))
  private def dec4(c: Column): Column = c.cast(DecimalType(12, 4))
  private def revTerm: Column = dec4(col("l_extendedprice")) * dec4(lit(1.0) - col("l_discount"))
  private def drevenue: Column = round(sum(revTerm), 2).cast("double")
  private val sqlRevenue =
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE)"

  /** Exact per-unit cost on the integer micro-cent grid: quantities are
    * integral (spec-checked), so price_cents * 10000 div qty is exact and
    * identical to DuckDB's `//`. The partsupp substitute (Q2/Q20).
    * nullif on the divisor: a zero-quantity line has NO unit cost — NULL
    * in both engines (DuckDB's `// 0` is already NULL; ANSI div throws),
    * and the min-cost aggregates skip it. */
  private val unitCostMicro =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000 div nullif(CAST(l_quantity AS BIGINT), 0)"
  private val sqlUnitCostMicro =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000 // CAST(l_quantity AS BIGINT)"

  // ---------------------------------------------------------------- q301
  /** TPC-H Q1 pricing summary, canonical cut: everything shipped up to
    * ~90 days before the corpus' last shipdate. */
  def q301(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) <= tsLit("2001-08-06T00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        drevenue.as("sum_disc_price"),
        round(sum(revTerm * dec4(lit(1.0) + col("l_tax"))), 2).cast("double").as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- q302
  /** TPC-H Q2 minimum-cost supplier. partsupp substitute: an "offer" is a
    * (part, supplier) pair observed in lineitem, costed at its minimum
    * shipped unit price (exact micro-cents). Region EUROPE, p_size = 15,
    * p_type STANDARD; correlated min-cost subquery kept. */
  def q302(s: SparkSession, d: String): DataFrame = {
    val offers = t(s, d, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), expr(unitCostMicro).as("cost"))
      .groupBy("l_partkey", "l_suppkey").agg(min("cost").as("cost_micro"))
    val eurSupp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val eurOffers = offers.join(eurSupp, col("l_suppkey") === col("s_suppkey"))
    val minCost = eurOffers.groupBy(col("l_partkey").as("mc_part"))
      .agg(min("cost_micro").as("min_cost"))
    eurOffers
      .join(minCost, col("l_partkey") === col("mc_part") &&
        col("cost_micro") === col("min_cost"))
      .join(t(s, d, "part").filter(col("p_size") === 15 && col("p_type") === "STANDARD"),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_name"), col("cost_micro"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  // ---------------------------------------------------------------- q303
  /** TPC-H Q3 shipping priority (o_orderpriority standing in for the
    * absent o_shippriority): BUILDING segment, orders before / shipments
    * after the cut date, top-10 open-order revenue. */
  def q303(s: SparkSession, d: String): DataFrame = {
    val cut = tsLit("1998-06-15T00:00:00")
    t(s, d, "lineitem").filter(ntz(col("l_shipdate")) > cut)
      .join(t(s, d, "orders").filter(ntz(col("o_orderdate")) < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(drevenue.as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q304
  /** TPC-H Q4 order-priority checking. Late-shipment substitute for the
    * absent commit/receipt dates: EXISTS a line shipped more than 30 days
    * after the order date. One quarter of orders; the EXISTS decorrelates
    * to a left-semi join. */
  def q304(s: SparkSession, d: String): DataFrame = {
    val late = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    t(s, d, "orders")
      .filter(ntz(col("o_orderdate")) >= tsLit("1998-07-01T00:00:00") &&
        ntz(col("o_orderdate")) < tsLit("1998-10-01T00:00:00"))
      .join(late, col("l_orderkey") === col("o_orderkey") &&
        ntz(col("l_shipdate")) > ntz(col("o_orderdate")) + expr("INTERVAL 30 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------- q305
  /** TPC-H Q5 local-supplier volume: ASIA, 1998, customer and supplier in
    * the SAME nation (the join that makes Q5 famous). */
  def q305(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders")
        .filter(ntz(col("o_orderdate")) >= tsLit("1998-01-01T00:00:00") &&
          ntz(col("o_orderdate")) < tsLit("1999-01-01T00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(drevenue.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  // ---------------------------------------------------------------- q306
  /** TPC-H Q6 forecasting-revenue change: one scan, three pushed
    * predicates, one exact decimal sum. */
  def q306(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) >= tsLit("1998-01-01T00:00:00") &&
        ntz(col("l_shipdate")) < tsLit("1999-01-01T00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(dec4(col("l_extendedprice")) * dec4(col("l_discount"))), 2)
        .cast("double").as("revenue"))

  // ---------------------------------------------------------------- q307
  /** TPC-H Q7 volume shipping between two nations, both directions,
    * grouped by shipment year. */
  def q307(s: SparkSession, d: String): DataFrame = {
    val (na, nb) = ("NATION_1", "NATION_2")
    t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) >= tsLit("1997-01-01T00:00:00") &&
        ntz(col("l_shipdate")) < tsLit("1999-01-01T00:00:00"))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(ntz(col("l_shipdate"))).as("l_year"))
      .agg(drevenue.as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // ---------------------------------------------------------------- q308
  /** TPC-H Q8 national market share: NATION_6's share of AMERICA's ECONOMY
    * part volume per order year. The share division runs once over two
    * exact decimal sums cast to double — deterministic in both engines. */
  def q308(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "part").filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "orders")
        .filter(ntz(col("o_orderdate")) >= tsLit("1997-01-01T00:00:00") &&
          ntz(col("o_orderdate")) < tsLit("1999-01-01T00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey").as("cnk"),
        col("n_regionkey").as("crk"))), col("c_nationkey") === col("cnk"))
      .join(broadcast(t(s, d, "region")).filter(col("r_name") === "AMERICA"),
        col("crk") === col("r_regionkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .groupBy(year(ntz(col("o_orderdate"))).as("o_year"))
      .agg(round(sum(when(col("supp_nation") === "NATION_6", revTerm)
          .otherwise(lit(0).cast(DecimalType(12, 4)))), 2).cast("double").as("nation_volume"),
        drevenue.as("total_volume"))
      .select(col("o_year"),
        round(col("nation_volume") / col("total_volume"), 6).as("mkt_share"))
      .orderBy("o_year")

  // ---------------------------------------------------------------- q309
  /** TPC-H Q9 product-type profit. Supply-cost substitute: a constant-rate
    * cost model, cost = 0.5 × p_retailprice per unit (partsupp's
    * ps_supplycost is absent); profit = revenue − cost × quantity, all in
    * exact decimals. Parts whose name contains "red". */
  def q309(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "part").filter(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(ntz(col("o_orderdate"))).as("o_year"))
      .agg(round(sum(revTerm -
          dec4(col("p_retailprice")) * dec4(col("l_quantity")) * dec4(lit(0.5))), 2)
        .cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  // ---------------------------------------------------------------- q310
  /** TPC-H Q10 returned-item reporting: top-20 customers by lost revenue
    * on returned lines for one quarter (customer address/phone/comment
    * columns absent — the join and ranking are the operator). */
  def q310(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      .join(t(s, d, "orders")
        .filter(ntz(col("o_orderdate")) >= tsLit("1998-01-01T00:00:00") &&
          ntz(col("o_orderdate")) < tsLit("1998-04-01T00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(drevenue.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  // ---------------------------------------------------------------- q311
  /** TPC-H Q11 important stock. Stock substitute: a supplier's observed
    * shipments of a part, valued at p_retailprice × quantity; NATION_7
    * suppliers; HAVING value > 0.0001 of the grand total (scalar subquery
    * → one-row broadcast join; decimal-exact compare). */
  def q311(s: SparkSession, d: String): DataFrame = {
    val positions = t(s, d, "lineitem")
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation")).filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        (dec4(col("p_retailprice")) * dec4(col("l_quantity"))).as("value"))
    val perPart = positions.groupBy("l_partkey")
      .agg(sum(col("value")).as("part_value"))
    val total = positions.agg((sum(col("value")) * lit(0.0001).cast(DecimalType(12, 6)))
      .as("threshold"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > col("threshold"))
      .select(col("l_partkey"), round(col("part_value"), 2).cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  // ---------------------------------------------------------------- q312
  /** TPC-H Q12 shipping-mode priority mix (l_shipmode absent →
    * l_linestatus bands the lines): for 1998 shipments, high- vs
    * low-priority order counts per band — the conditional-count pair
    * that defines Q12's aggregate shape. */
  def q312(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) >= tsLit("1998-01-01T00:00:00") &&
        ntz(col("l_shipdate")) < tsLit("1999-01-01T00:00:00"))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("l_linestatus")

  // ---------------------------------------------------------------- q313
  /** TPC-H Q13 customer order-count distribution (comment filter absent →
    * exclude 4-NOT SPECIFIED orders): LEFT join so zero-order customers
    * land in the c_count = 0 bucket, then the histogram of counts. */
  def q313(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  // ---------------------------------------------------------------- q314
  /** TPC-H Q14 promotion effect: PROMO-part revenue share of one
    * shipment month, 100 × promo/total over two exact decimal sums. */
  def q314(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) >= tsLit("1998-09-01T00:00:00") &&
        ntz(col("l_shipdate")) < tsLit("1998-10-01T00:00:00"))
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .agg((round(sum(when(col("p_type") === "PROMO", revTerm)
          .otherwise(lit(0).cast(DecimalType(12, 4)))), 2).cast("double") * 100.0 /
        drevenue).as("promo_revenue"))

  // ---------------------------------------------------------------- q315
  /** TPC-H Q15 top supplier: per-supplier revenue for one quarter as an
    * EXACT decimal; the max-revenue scalar subquery compares decimals, so
    * ties (and the equality itself) are engine-portable. */
  def q315(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) >= tsLit("1998-07-01T00:00:00") &&
        ntz(col("l_shipdate")) < tsLit("1998-10-01T00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(revTerm), 2).as("total_revenue"))
    val mx = rev.agg(max("total_revenue").as("max_revenue"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  // ---------------------------------------------------------------- q316
  /** TPC-H Q16 parts/supplier relationship. partsupp substitute: distinct
    * (part, supplier) pairs observed in lineitem; the complaints-comment
    * exclusion becomes s_acctbal < 0. */
  def q316(s: SparkSession, d: String): DataFrame = {
    val pairs = t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
    pairs
      .join(t(s, d, "part").filter(col("p_brand") =!= "Brand#45" &&
        col("p_type") =!= "MEDIUM" &&
        col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_supp")),
        col("l_suppkey") === col("bad_supp"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  // ---------------------------------------------------------------- q317
  /** TPC-H Q17 small-quantity-order revenue (p_container absent → p_size
    * band): lines of Brand#23 small parts with quantity below 20% of the
    * part's average, priced out at sum/7. The 0.2 × avg compare runs as
    * exact integer algebra: qty < 0.2 × (sumq/cnt)  ⇔  5·qty·cnt < sumq
    * (quantities are integral — spec-checked). */
  def q317(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val perPart = li.groupBy(col("l_partkey").as("ap_part"))
      .agg(sum(col("l_quantity").cast("long")).as("sumq"),
        count(lit(1)).as("cntq"))
    li.join(t(s, d, "part").filter(col("p_brand") === "Brand#23" && col("p_size") < 10),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("ap_part"))
      .filter(col("l_quantity").cast("long") * 5 * col("cntq") < col("sumq"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  // ---------------------------------------------------------------- q318
  /** TPC-H Q18 large-volume customers: orders whose total quantity
    * exceeds 300, top-100 by order value. */
  def q318(s: SparkSession, d: String): DataFrame = {
    val big = t(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("big_okey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    t(s, d, "orders")
      .join(big, col("o_orderkey") === col("big_okey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  // ---------------------------------------------------------------- q319
  /** TPC-H Q19 discounted revenue: the classic OR-of-three-band predicate
    * (p_container → p_size bands), one revenue sum. */
  def q319(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(drevenue.as("revenue"))

  // ---------------------------------------------------------------- q320
  /** TPC-H Q20 potential part promotion. Availability substitute: a
    * NATION_3 supplier qualifies if, for some "bolt" part, its 1998
    * shipped quantity exceeds half the part's total 1998 shipped quantity
    * (2·supp_qty > part_qty — exact integers). Semi-join chain kept. */
  def q320(s: SparkSession, d: String): DataFrame = {
    val bolt = t(s, d, "part").filter(col("p_name").contains("bolt"))
      .select(col("p_partkey"))
    val li98 = t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) >= tsLit("1998-01-01T00:00:00") &&
        ntz(col("l_shipdate")) < tsLit("1999-01-01T00:00:00"))
      // bolt is a fixed FRACTION of part, so it grows with SF — no hint;
      // AQE broadcasts it while it measures small and shuffles past that
      .join(bolt, col("l_partkey") === col("p_partkey"))
    val perPart = li98.groupBy(col("l_partkey").as("pp_part"))
      .agg(sum(col("l_quantity").cast("long")).as("part_qty"))
    val perSupp = li98.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("supp_qty"))
    val qualified = perSupp.join(perPart, col("l_partkey") === col("pp_part"))
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .select(col("l_suppkey")).distinct()
    t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  // ---------------------------------------------------------------- q321
  /** TPC-H Q21 suppliers who kept orders waiting. Lateness substitute:
    * shipped more than a year after the order date; finished orders where
    * THIS NATION_2 supplier shipped late, some other supplier shipped on
    * the order (EXISTS → semi), and no other supplier shipped late
    * (NOT EXISTS → anti). */
  def q321(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (ntz(col("l_shipdate")) > ntz(col("o_orderdate")) + expr("INTERVAL 365 DAY"))
          .as("late"))
    val l1 = li.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val others = li.select(col("l_orderkey").as("o2_key"), col("l_suppkey").as("o2_supp"))
      .distinct()
    val lateOthers = l1.select(col("l_orderkey").as("o3_key"), col("l_suppkey").as("o3_supp"))
    l1
      .join(others, col("l_orderkey") === col("o2_key") &&
        col("l_suppkey") =!= col("o2_supp"), "left_semi")
      .join(lateOthers, col("l_orderkey") === col("o3_key") &&
        col("l_suppkey") =!= col("o3_supp"), "left_anti")
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation")).filter(col("n_name") === "NATION_2"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  // ---------------------------------------------------------------- q322
  /** TPC-H Q22 global sales opportunity. Country-code substitute:
    * c_nationkey plays c_phone's code; "no orders" (every customer here
    * has orders) becomes "no large orders" (none above 300k). The
    * "above the positive-balance average" cut is CROSS-MULTIPLIED —
    * bal·n_pos > sum_bal over exact decimals — never divided: a divided
    * average is a rounded value (and DuckDB promotes sum(DECIMAL)/count
    * to DOUBLE), so the strict > flips on corpora where the true average
    * lands exactly on a cent-grid balance; the cross-multiplied form
    * compares against the exact rational average in both engines. */
  def q322(s: SparkSession, d: String): DataFrame = {
    val codes = Seq(1, 3, 5, 7, 9, 11, 13)
    val cust = t(s, d, "customer").filter(col("c_nationkey").isin(codes: _*))
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("sum_bal"),
        count(lit(1)).as("n_pos"))
    val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal").cast(DecimalType(18, 2)) * col("n_pos")
        > col("sum_bal"))
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntrycode")
  }

  // ------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q301_tpch1_pricing" -> (q301 _),
    "q302_tpch2_mincost" -> (q302 _),
    "q303_tpch3_shipprio" -> (q303 _),
    "q304_tpch4_orderprio" -> (q304 _),
    "q305_tpch5_localsupp" -> (q305 _),
    "q306_tpch6_forecast" -> (q306 _),
    "q307_tpch7_volume" -> (q307 _),
    "q308_tpch8_mktshare" -> (q308 _),
    "q309_tpch9_profit" -> (q309 _),
    "q310_tpch10_returns" -> (q310 _),
    "q311_tpch11_stock" -> (q311 _),
    "q312_tpch12_shipmode" -> (q312 _),
    "q313_tpch13_custdist" -> (q313 _),
    "q314_tpch14_promo" -> (q314 _),
    "q315_tpch15_topsupp" -> (q315 _),
    "q316_tpch16_partsupp" -> (q316 _),
    "q317_tpch17_smallqty" -> (q317 _),
    "q318_tpch18_bigcust" -> (q318 _),
    "q319_tpch19_discount" -> (q319 _),
    "q320_tpch20_promosupp" -> (q320 _),
    "q321_tpch21_waiting" -> (q321 _),
    "q322_tpch22_opportunity" -> (q322 _))

  val oracle: Map[String, String] = Map(
    "q301_tpch1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         | round(sum(l_quantity), 2) AS sum_qty,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         | $sqlRevenue AS sum_disc_price,
         | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
         |   * CAST(1.0 - l_discount AS DECIMAL(12,4))
         |   * CAST(1.0 + l_tax AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_charge,
         | round(avg(l_quantity), 4) AS avg_qty,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q302_tpch2_mincost" ->
      s"""WITH offers AS (
         | SELECT l_partkey, l_suppkey,
         |  min($sqlUnitCostMicro) AS cost_micro
         | FROM lineitem GROUP BY 1, 2),
         |eur AS (
         | SELECT o.l_partkey, o.l_suppkey, o.cost_micro,
         |  s.s_name, s.s_acctbal, n.n_name
         | FROM offers o
         | JOIN supplier s ON o.l_suppkey = s.s_suppkey
         | JOIN nation n ON s.s_nationkey = n.n_nationkey
         | JOIN region r ON n.n_regionkey = r.r_regionkey
         | WHERE r.r_name = 'EUROPE'),
         |mc AS (SELECT l_partkey, min(cost_micro) AS min_cost FROM eur GROUP BY 1)
         |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
         | e.cost_micro
         |FROM eur e
         |JOIN mc ON mc.l_partkey = e.l_partkey AND e.cost_micro = mc.min_cost
         |JOIN part p ON e.l_partkey = p.p_partkey
         |WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
         |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
         |LIMIT 100""".stripMargin,
    "q303_tpch3_shipprio" ->
      s"""SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         | $sqlRevenue AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         | AND o.o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
         | AND l.l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,
    "q304_tpch4_orderprio" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-07-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1998-10-01 00:00:00'
        | AND EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q305_tpch5_localsupp" ->
      s"""SELECT n.n_name, $sqlRevenue AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         | AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
         | AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n.n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q306_tpch6_forecast" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
        |  * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        | AND l_discount BETWEEN 0.05 AND 0.07
        | AND l_quantity < 24""".stripMargin,
    "q307_tpch7_volume" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         | CAST(year(l.l_shipdate) AS INT) AS l_year, $sqlRevenue AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         | AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
         | AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q308_tpch8_mktshare" ->
      """WITH vol AS (
        | SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
        |  CAST(round(sum(CASE WHEN sn.n_name = 'NATION_6'
        |    THEN CAST(l.l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1.0 - l.l_discount AS DECIMAL(12,4))
        |    ELSE CAST(0 AS DECIMAL(12,4)) END), 2) AS DOUBLE) AS nation_volume,
        |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(12,4))), 2) AS DOUBLE)
        |   AS total_volume
        | FROM lineitem l
        | JOIN part p ON l.l_partkey = p.p_partkey
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        | JOIN region r ON cn.n_regionkey = r.r_regionkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        | WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        | GROUP BY 1)
        |SELECT o_year, round(nation_volume / total_volume, 6) AS mkt_share
        |FROM vol ORDER BY o_year""".stripMargin,
    "q309_tpch9_profit" ->
      """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
        | CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |   * CAST(1.0 - l.l_discount AS DECIMAL(12,4))
        |  - CAST(p.p_retailprice AS DECIMAL(12,4))
        |   * CAST(l.l_quantity AS DECIMAL(12,4))
        |   * CAST(0.5 AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q310_tpch10_returns" ->
      s"""SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         | $sqlRevenue AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         | AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
         | AND o.o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "q311_tpch11_stock" ->
      """WITH pos AS (
        | SELECT l.l_partkey,
        |  CAST(p.p_retailprice AS DECIMAL(12,4))
        |    * CAST(l.l_quantity AS DECIMAL(12,4)) AS value
        | FROM lineitem l
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN part p ON l.l_partkey = p.p_partkey
        | WHERE n.n_name = 'NATION_7'),
        |pp AS (SELECT l_partkey, sum(value) AS part_value FROM pos GROUP BY 1),
        |tot AS (SELECT sum(value) * CAST(0.0001 AS DECIMAL(12,6)) AS threshold
        |        FROM pos)
        |SELECT pp.l_partkey,
        | CAST(round(pp.part_value, 2) AS DOUBLE) AS value
        |FROM pp, tot WHERE pp.part_value > tot.threshold
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q312_tpch12_shipmode" ->
      """SELECT l.l_linestatus,
        | CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        | AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q313_tpch13_custdist" ->
      """WITH co AS (
        | SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        | FROM customer c
        | LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  AND o.o_orderpriority <> '4-NOT SPECIFIED'
        | GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q314_tpch14_promo" ->
      """SELECT CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
        |   THEN CAST(l.l_extendedprice AS DECIMAL(12,4))
        |     * CAST(1.0 - l.l_discount AS DECIMAL(12,4))
        |   ELSE CAST(0 AS DECIMAL(12,4)) END), 2) AS DOUBLE) * 100.0
        | / CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |     * CAST(1.0 - l.l_discount AS DECIMAL(12,4))), 2) AS DOUBLE)
        | AS promo_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1998-09-01 00:00:00'
        | AND l.l_shipdate < TIMESTAMP '1998-10-01 00:00:00'""".stripMargin,
    "q315_tpch15_topsupp" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS total_revenue
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-10-01 00:00:00'
        | GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name,
        | CAST(r.total_revenue AS DOUBLE) AS total_revenue
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q316_tpch16_partsupp" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p.p_brand, p.p_type, p.p_size,
        | count(DISTINCT pr.l_suppkey) AS supplier_cnt
        |FROM pairs pr JOIN part p ON pr.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'MEDIUM'
        | AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        | AND pr.l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q317_tpch17_smallqty" ->
      """WITH ap AS (
        | SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |   AS sumq,
        |  count(*) AS cntq
        | FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |  / 7.0 AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN ap ON l.l_partkey = ap.l_partkey
        |WHERE p.p_brand = 'Brand#23' AND p.p_size < 10
        | AND CAST(l.l_quantity AS BIGINT) * 5 * ap.cntq < ap.sumq""".stripMargin,
    "q318_tpch18_bigcust" ->
      """WITH big AS (
        | SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |   AS sum_qty
        | FROM lineitem GROUP BY 1
        | HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        | o.o_totalprice, b.sum_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q319_tpch19_discount" ->
      s"""SELECT $sqlRevenue AS revenue
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         |    AND l.l_quantity BETWEEN 1 AND 11)
         |  OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         |    AND l.l_quantity BETWEEN 10 AND 20)
         |  OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
         |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q320_tpch20_promosupp" ->
      """WITH li98 AS (
        | SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS q
        | FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        | WHERE p.p_name LIKE '%bolt%'
        |  AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'),
        |pp AS (SELECT l_partkey, sum(q) AS part_qty FROM li98 GROUP BY 1),
        |ps AS (SELECT l_partkey, l_suppkey, sum(q) AS supp_qty
        |       FROM li98 GROUP BY 1, 2),
        |qual AS (
        | SELECT DISTINCT ps.l_suppkey
        | FROM ps JOIN pp ON ps.l_partkey = pp.l_partkey
        | WHERE ps.supp_qty * 2 > pp.part_qty)
        |SELECT s.s_suppkey, s.s_name
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE n.n_name = 'NATION_3'
        | AND EXISTS (SELECT 1 FROM qual WHERE qual.l_suppkey = s.s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,
    "q321_tpch21_waiting" ->
      """WITH li AS (
        | SELECT l.l_orderkey, l.l_suppkey,
        |  l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY AS late
        | FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | WHERE o.o_orderstatus = 'F'),
        |l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
        |SELECT s.s_name, count(*) AS numwait
        |FROM l1
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE n.n_name = 'NATION_2'
        | AND EXISTS (SELECT 1 FROM li l2
        |   WHERE l2.l_orderkey = l1.l_orderkey
        |    AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM li l3
        |   WHERE l3.l_orderkey = l1.l_orderkey
        |    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q322_tpch22_opportunity" ->
      """WITH cust AS (
        | SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        | WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |ab AS (
        | SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
        |  count(*) AS n_pos
        | FROM cust WHERE c_acctbal > 0)
        |SELECT c.c_nationkey AS cntrycode, count(*) AS numcust,
        | CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust c, ab
        |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * ab.n_pos > ab.sum_bal
        | AND NOT EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
