package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical / advanced aggregation surface: percentiles, moments,
  * correlation, ordered string aggregation, pivot, generator (explode),
  * approximate distinct, and the UDF/UDAF registration machinery.
  *
  * Scale notes: percentile() is an exact sort-based aggregate (fine per
  * group; for global percentiles at 100 TB use approx_percentile), moments/
  * corr are single-pass mergeable aggregates, pivot compiles to conditional
  * counts (one pass, no shuffle beyond the groupBy), and the UDAF merges a
  * constant-size buffer.
  */
object StatsOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // ---------------------------------------------------------------- q45
  /** Exact interpolated percentiles per group (same linear-interpolation
    * definition as DuckDB quantile_cont). */
  def q45Percentiles(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
        round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"))
      .orderBy("o_orderstatus")

  // ---------------------------------------------------------------- q46
  /** Second-moment aggregates: stddev/variance/correlation/covariance.
    * Single-pass mergeable (Welford-style) in both engines; rounded because
    * the merge order differs. */
  def q46Moments(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q47
  /** Ordered distinct string aggregation (deterministic by sorting). */
  def q47CollectSorted(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        concat_ws(",", sort_array(collect_set(col("o_orderpriority")))).as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("o_orderstatus")

  // ---------------------------------------------------------------- q48
  /** Pivot: status columns from rows (compiles to conditional aggregates —
    * one pass; pivot values pinned so the schema is static, as required for
    * a deterministic plan at any scale). */
  def q48Pivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- q49
  /** Generator / table function shape: explode tokens, global top-20. */
  def q49ExplodeTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  // ---------------------------------------------------------------- q50
  /** Typed UDAF via Aggregator + functions.udaf: constant-size mergeable
    * buffer (count / integer-valued sum / min / max => order-independent,
    * so the oracle stays exact). */
  case class QtyStats(n: Long, sum: Double, mn: Double, mx: Double)
  val qtyStatsAgg: Aggregator[Double, QtyStats, QtyStats] =
    new Aggregator[Double, QtyStats, QtyStats] {
      def zero: QtyStats = QtyStats(0L, 0.0, Double.MaxValue, Double.MinValue)
      def reduce(b: QtyStats, a: Double): QtyStats =
        QtyStats(b.n + 1, b.sum + a, math.min(b.mn, a), math.max(b.mx, a))
      def merge(x: QtyStats, y: QtyStats): QtyStats =
        QtyStats(x.n + y.n, x.sum + y.sum, math.min(x.mn, y.mn), math.max(x.mx, y.mx))
      def finish(r: QtyStats): QtyStats = r
      def bufferEncoder = Encoders.product[QtyStats]
      def outputEncoder = Encoders.product[QtyStats]
    }

  def q50Udaf(s: SparkSession, d: String): DataFrame = {
    val stats = udaf(qtyStatsAgg)
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(stats(col("l_quantity")).as("s"))
      .select(
        col("l_returnflag"),
        col("s.n").as("n_rows"),
        col("s.sum").as("sum_qty"),
        col("s.mn").as("min_qty"),
        col("s.mx").as("max_qty"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- q51
  /** Scalar Scala UDF registration path (the capability; for anything this
    * simple a native expression — here the oracle's split_part — is the
    * performant choice, since UDFs break codegen fusion). */
  def q51Udf(s: SparkSession, d: String): DataFrame = {
    val priorityRank = udf((p: String) => p.split("-")(0).toInt)
    t(s, d, "orders")
      .select(col("o_orderkey"), priorityRank(col("o_orderpriority")).as("priority_rank"))
      .filter(col("priority_rank") <= 2)
      .groupBy("priority_rank")
      .agg(count(lit(1)).as("n"))
      .orderBy("priority_rank")
  }

  // ---------------------------------------------------------------- q52
  /** approx_count_distinct (HLL++): sketch values differ across engines →
    * rows-only driver check; the spec asserts <2% error vs exact. */
  def q52ApproxDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q85
  /** Fixed-width HISTOGRAM — equi-width value binning per event type
    * (bin = floor(value / width)), the distribution-sketching aggregate
    * behind dashboards and data-quality monitors. The bin id is integer
    * floor of one IEEE division (engine-deterministic), counts are
    * integers, and the per-bin value mass sums in DECIMAL — so the whole
    * histogram keeps an exact oracle. One shuffle on (type, bin) with full
    * map-side combine; bin cardinality is bounded by the value range, not
    * the row count, so the result stays tiny at any scale. */
  def q85ValueHistogram(s: SparkSession, d: String, width: Double = 10.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    t(s, d, "events")
      .select(col("event_type"), col("value"),
        floor(col("value") / width).cast("long").as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .withColumn("bin_lo", col("bin") * width)
      .select("event_type", "bin", "bin_lo", "n_events", "sum_value")
      .orderBy("event_type", "bin")
  }

  // ------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_value_histogram" -> ((s: SparkSession, d: String) => q85ValueHistogram(s, d)),
    "q45_percentiles" -> (q45Percentiles _),
    "q46_moments" -> (q46Moments _),
    "q47_collect_sorted" -> (q47CollectSorted _),
    "q48_pivot" -> (q48Pivot _),
    "q49_explode_tokens" -> (q49ExplodeTokens _),
    "q50_udaf_stats" -> (q50Udaf _),
    "q51_udf_rank" -> (q51Udf _),
    "q52_approx_distinct" -> (q52ApproxDistinct _))

  val oracle: Map[String, String] = Map(
    "q85_value_histogram" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        | CAST(floor(value / 10.0) AS BIGINT) * 10.0 AS bin_lo,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q45_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q46_moments" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_extendedprice), 4) AS sd_price,
        | round(var_samp(l_quantity), 4) AS var_qty,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q47_collect_sorted" ->
      """SELECT o_orderstatus,
        | string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        | count(DISTINCT o_orderpriority) AS n_priorities
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q48_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (o_orderstatus = 'F') AS F,
        | count(*) FILTER (o_orderstatus = 'O') AS O,
        | count(*) FILTER (o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q49_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        | SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        | FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q50_udaf_stats" ->
      """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q51_udf_rank" ->
      """SELECT priority_rank, count(*) AS n FROM (
        | SELECT CAST(split_part(o_orderpriority, '-', 1) AS INT) AS priority_rank
        | FROM orders)
        |WHERE priority_rank <= 2
        |GROUP BY priority_rank ORDER BY priority_rank""".stripMargin)
}
