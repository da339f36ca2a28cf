package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query library over the driver test tables.
  *
  * The reference (/root/reference/src/main.rs) has no relational operators
  * beyond projection (main.rs:130-151); everything here is the additive
  * engine surface mandated by SURVEY.md §2.2 / §7.3, expressed declaratively
  * on the DataFrame API so Catalyst gets full pushdown / pruning / join
  * planning freedom.
  *
  * Oracle-compat conventions (every query here has a DuckDB oracle):
  *  - every computed column is aliased, identically in Spark and SQL
  *    (driver compares columns by name);
  *  - a total ORDER BY over a deterministic key set in both engines;
  *  - any double that is *accumulated* across rows (sum/avg/window-sum) is
  *    round()ed at a fixed scale, because FP addition is not associative and
  *    Spark's partial-aggregate order differs from DuckDB's sequential order.
  *    Raw column values and single-row arithmetic pass through exactly.
  *  - timestamps are compared/emitted via timestamp_ntz so the parquet
  *    footer (isAdjustedToUTC) matches DuckDB's naive TIMESTAMP.
  *
  * Scale notes (local[32] here, 1000-executor cluster in spirit):
  *  - fact-fact joins (lineitem x orders) shuffle on the join key and rely on
  *    AQE for skew/size adaptation; dimension joins (nation, region, bands)
  *    are explicit broadcast() so no shuffle of the fact side is wasted;
  *  - aggregations are partial-aggregate friendly (sum/count/min/max/avg over
  *    groupBy keys) so map-side combine cuts shuffle volume;
  *  - top-k uses orderBy.limit which Spark plans as TakeOrderedAndProject
  *    (per-partition heap + driver merge, no total sort).
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  /** Normalize any timestamp flavor to NTZ (session tz is pinned UTC).
    * Shared across ops (EtlOps) so the timestamp convention lives once. */
  private[ops] def ntz(c: Column): Column = c.cast("timestamp_ntz")
  private[ops] def tsLit(s: String): Column = lit(java.time.LocalDateTime.parse(s))

  import org.apache.spark.sql.types.DecimalType
  /** Exact accumulation for 2-decimal money/value columns. Summing doubles
    * is order-dependent, and a round() of two near-boundary sums CAN differ
    * between Spark's partial-agg order and DuckDB's sequential order (seen
    * once at sf0.01). Summing in DECIMAL is exact and order-free; the single
    * final cast to double is IEEE-deterministic in both engines. */
  private[ops] def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def davg(c: Column): Column = dsum(c) / count(lit(1))
  /** Exact sum(price * (1 - discount)) via 4-decimal decimal products.
    * The exact wide-scale decimal is rounded to scale 2 BEFORE the double
    * cast: a scale-12 decimal -> double conversion is double-rounded in some
    * engines (int128 -> double, then / 10^12), while a scale-2 decimal of
    * this magnitude converts with one exact division. */
  private def drevenue: Column =
    round(sum(col("l_extendedprice").cast(DecimalType(12, 4)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(12, 4))), 2).cast("double")
  private def dcharge: Column =
    round(sum(col("l_extendedprice").cast(DecimalType(12, 4)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(12, 4)) *
      (lit(1.0) + col("l_tax")).cast(DecimalType(12, 4))), 2).cast("double")
  /** SQL twins of the above (identical text on the DuckDB side). */
  private def sqlDsum(x: String) = s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private def sqlDavg(x: String) = s"${sqlDsum(x)} / count(*)"
  private val sqlRevenue =
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE)"
  private val sqlCharge =
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4)) * CAST(1.0 + l_tax AS DECIMAL(12,4))), 2) AS DOUBLE)"

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: filter + groupBy + 8 aggregates.
    * Whole query is one scan + one partial/final hash aggregate. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(ntz(col("l_shipdate")) <= tsLit("2000-12-01T00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        drevenue.as("sum_disc_price"),
        dcharge.as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- q02
  /** Predicate + projection; both push into the parquet scan
    * (PushedFilters + ReadSchema — the optimization the eager reference
    * lacked, SURVEY.md §4.1). No floats are recomputed: values pass through. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_quantity") >= 48 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- q03
  /** String scalar functions (codegen'd, no UDFs). */
  def q03ScalarString(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      upper(substring(col("text"), 1, 20)).as("head_upper"),
      length(col("text")).as("len_chars"),
      locate("spark", col("text")).as("spark_pos"),
      concat_ws("|", col("lang"), col("source")).as("lang_src"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q04
  /** Date/time scalar functions over orders. */
  def q04ScalarDate(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        ntz(date_trunc("month", ntz(col("o_orderdate")))).as("month_start"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- q249
  /** TYPED mapGroups — the one KeyValueGroupedDataset verb left
    * (cogroup q232, flatMapGroupsWithState/transformWithState in the
    * streams): an arbitrary Scala fold per key. The fold here is
    * deliberately ORDER-INSENSITIVE (count/sum/min/max/xor — mapGroups
    * hands the group iterator in engine order, which is not a contract;
    * an order-sensitive fold belongs behind the q247 secondary sort),
    * and the xor doubles as a key-set checksum no built-in aggregate
    * chain produces in one typed pass. */
  def q249MapGroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (tpe, it) =>
        var n = 0L; var sum = 0L; var mn = Long.MaxValue
        var mx = Long.MinValue; var xorIds = 0L
        it.foreach { case (_, id, c) =>
          n += 1; sum += c
          if (c < mn) mn = c
          if (c > mx) mx = c
          xorIds ^= id
        }
        (tpe, n, sum, mn, mx, xorIds)
      }
      .toDF("event_type", "n_events", "sum_c", "min_c", "max_c", "xor_ids")
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q242
  /** TRY_* ERROR-SAFE ARITHMETIC — the ANSI-mode migration surface:
    * under ANSI SQL semantics a divide-by-zero, bad cast, or numeric
    * overflow ABORTS the job at 100 TB after hours of progress; the
    * try_* family returns NULL instead, row by row, so one poisoned
    * record cannot kill the pipeline. Each column demonstrates one
    * failure class (zero divisor, unparseable cast, long overflow)
    * alongside its succeeding twin. The oracle states the CONTRACT —
    * the exact expected values including the NULLs — rather than
    * re-running the failure (DuckDB would error on some of them, which
    * is precisely the difference being pinned). */
  def q242TryArithmetic(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(100)) === 0 &&
        col("l_orderkey") > 0 && col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        expr("try_divide(l_extendedprice, l_quantity)").as("ok_div"),
        expr("try_divide(l_extendedprice, l_quantity - l_quantity)")
          .as("null_div"),
        expr("try_cast(concat('x', l_orderkey) AS INT)").as("null_cast"),
        expr("try_cast(CAST(l_orderkey AS STRING) AS BIGINT)").as("ok_cast"),
        expr("try_add(CAST(9223372036854775807 AS BIGINT), l_orderkey)")
          .as("null_overflow"),
        expr("try_multiply(l_orderkey, CAST(2 AS BIGINT))").as("ok_mult"))
      .orderBy("l_orderkey")

  // ---------------------------------------------------------------- q243
  /** BITWISE AGGREGATES — bit_and / bit_or / bit_xor over groups (the
    * flag-mask rollups behind permission systems and feature-flag
    * audits) plus scalar shifts and masks: all pure integer ops, exact
    * in any engine. bit_xor doubles as a cheap order-insensitive
    * checksum of a key set (the q97 table-checksum idea as a built-in). */
  def q243BitwiseOps(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("CAST(bit_and(l_linenumber) AS BIGINT)").as("and_line"),
        expr("CAST(bit_or(l_linenumber) AS BIGINT)").as("or_line"),
        expr("bit_xor(l_orderkey)").as("xor_keys"),
        expr("bit_or(shiftleft(CAST(1 AS BIGINT)," +
          " CAST(l_linenumber % 7 AS INT)))").as("line_mask"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q240
  /** MODERN SQL SUGAR — the analyst-facing syntax conveniences in one
    * statement: inline VALUES tables, the range() table-valued function,
    * GROUP BY ALL (group by every non-aggregate select column) and ORDER
    * BY ALL. Semantically a plain band join + aggregate (all integers,
    * exact), but the SURFACE is the point: a user migrating ad-hoc SQL
    * must not have to rewrite these forms. The oracle states the same
    * query in DuckDB's spelling of the identical sugar. */
  def q240SqlSugar(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_q240_events")
    s.sql("""
      |WITH labels AS (
      |  SELECT * FROM VALUES (0, 'low'), (1, 'mid'), (2, 'high')
      |    AS v(band, label)),
      |bands AS (
      |  SELECT r.id AS band, l.label
      |  FROM range(3) r JOIN labels l ON l.band = r.id),
      |e AS (
      |  SELECT event_type, user_id,
      |    least(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      div 2500, CAST(2 AS BIGINT)) AS band
      |  FROM graft_q240_events)
      |SELECT e.event_type, b.label, count(*) AS n_events,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN bands b ON b.band = e.band
      |GROUP BY ALL ORDER BY ALL
      |""".stripMargin)
  }

  // ---------------------------------------------------------------- q234
  /** OBSERVE METRICS — `Dataset.observe` + `Observation`, the engine's
    * in-flight observability API (the O9 surface made first-class): a
    * quality gate attaches named aggregate metrics to a flowing Dataset
    * and reads them after ONE pass — no second scan, no separate
    * monitoring query, which is the entire point at 100 TB (metrics ride
    * the action that was running anyway). The observed values (row
    * count, cents sum/min/max, negative-value count) are exact integers;
    * the query returns them as its result row, so the driver's oracle
    * hash-checks the OBSERVATION itself against a direct aggregate —
    * proving the side-channel sees every row exactly once. */
  def q234ObserveMetrics(s: SparkSession, d: String): DataFrame = {
    val obs = org.apache.spark.sql.Observation("graft_gate")
    val flow = t(s, d, "events")
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum("c").as("sum_c"),
        min("c").as("min_c"),
        max("c").as("max_c"),
        sum(when(col("c") < 0L, 1L).otherwise(0L)).as("n_negative"))
    // the action the metrics ride on (a real pipeline's parquet write)
    flow.write.format("noop").mode("overwrite").save()
    val m = obs.get
    import s.implicits._
    // empty-input contract: sum/min/max over zero rows observe as NULL —
    // reported as 0 EXPLICITLY (the oracle coalesces identically), not via
    // the silent null-unboxing accident this line used to rely on
    def z(k: String): Long = Option(m(k)).fold(0L)(_.asInstanceOf[Long])
    Seq((z("n_rows"), z("sum_c"), z("min_c"), z("max_c"), z("n_negative")))
      .toDF("n_rows", "sum_c", "min_c", "max_c", "n_negative")
  }

  // ---------------------------------------------------------------- q235
  /** GENERATOR SEMANTICS — the explode-family corner users hit once and
    * never forget: `explode` DROPS rows whose array is empty, while
    * `explode_outer` keeps them with a NULL element (the LEFT-JOIN-unnest
    * dual). Per language: document count, row counts under both
    * semantics (outer − inner = exactly the empty-array docs), and the
    * empty-doc count cross-checked directly. The probe array is the
    * z-containing tokens of each document — rare enough that empties
    * actually occur. One generator pass per semantics, map-side until
    * the final lang-grained aggregate. */
  def q235GeneratorSemantics(s: SparkSession, d: String): DataFrame = {
    // three independent consumers (inner, outer, the docs aggregate) —
    // checkpoint once so the tokenize+filter scan runs once, not 3×
    val base = graft.Transients.track(t(s, d, "documents")
      .select(col("lang"),
        filter(TextOps.tokens(col("text")), tk => tk.contains("z"))
          .as("ztoks"))
      .transform(graft.Transients.cut))
    val inner = base.select(col("lang"), explode(col("ztoks")).as("tk"))
      .groupBy("lang").agg(count(lit(1)).as("n_inner"))
    val outer = base.select(col("lang"), explode_outer(col("ztoks")).as("tk"))
      .groupBy("lang").agg(count(lit(1)).as("n_outer"),
        sum(when(col("tk").isNull, 1L).otherwise(0L)).as("n_null_rows"))
    base.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        // a NULL array (NULL text) generates nothing under explode and one
        // NULL row under explode_outer — exactly an empty doc's behavior,
        // so the empty count treats NULL as size 0 (oracle coalesces the
        // same way) and outer − inner = n_empty_docs stays an identity
        sum(when(coalesce(size(col("ztoks")), lit(0)) === 0, 1L)
          .otherwise(0L)).as("n_empty_docs"))
      .join(outer, Seq("lang"))
      .join(inner, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_empty_docs"),
        coalesce(col("n_inner"), lit(0L)).as("n_inner"), col("n_outer"),
        col("n_null_rows"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q232
  /** TYPED COGROUP reconciliation — the order-header vs line-detail
    * consistency audit (does o_totalprice equal the sum of its lines'
    * charges?) run through `Dataset.cogroup`, the typed API's per-key
    * custom-merge operator that no other query exercises: both sides
    * co-partition on the key in ONE exchange each and the lambda sees
    * (key, header rows, line rows) together — the typed analogue of a
    * sort-merge full-outer join, with no build-side materialization and
    * no width limit on the merge logic. Headers without lines surface
    * with n_lines = 0 (the full-outer face a semi-join audit would
    * drop). Exactness: per-line charges follow q01's decimal discipline
    * (each ≤4-dp factor cast to DECIMAL(12,4), multiplied exactly,
    * rounded once to cents), the fold sums longs. */
  def q232CogroupRecon(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val oKV = t(s, d, "orders")
      .filter(pmod(col("o_orderkey"), lit(23)) === 0)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("oc"))
      .as[(Long, Long)].groupByKey(_._1)
    val lKV = t(s, d, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(23)) === 0)
      .select(col("l_orderkey"),
        expr("""CAST(round(CAST(l_extendedprice AS DECIMAL(12,4))
               | * CAST(1.0 - l_discount AS DECIMAL(12,4))
               | * CAST(1.0 + l_tax AS DECIMAL(12,4)), 2) * 100 AS BIGINT)"""
          .stripMargin).as("lc"))
      .as[(Long, Long)].groupByKey(_._1)
    oKV.cogroup(lKV) { case (k, os, ls) =>
      val header = os.toSeq
      if (header.isEmpty) Iterator.empty // lines without a header: none by FK
      else {
        val lcs = ls.map(_._2).toSeq
        val total = lcs.sum
        Iterator.single(
          (k, header.head._2, total, header.head._2 - total,
            lcs.length.toLong))
      }
    }.toDF("o_orderkey", "order_total_c", "lines_total_c", "delta_c",
        "n_lines")
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- q230
  /** STRING TOOLKIT — the manipulation surface q03's basics leave out:
    * field splitting (split_part), character-class mapping (translate),
    * regex extraction (regexp_extract_all, joined deterministically) and
    * counting (regexp_count), edit distance (levenshtein — the built-in
    * complement to the native Jaro-Winkler expression of q204), padding
    * and repetition. Every function is a per-row scalar with an exact
    * cross-engine twin (regexes kept to the RE2-subset discipline);
    * zero shuffles beyond the final ORDER BY. */
  def q230StringToolkit(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .filter(pmod(col("p_partkey"), lit(13)) === 0)
      .select(
        col("p_partkey"),
        col("p_name"),
        expr("split_part(p_name, ' ', 2)").as("second_word"),
        translate(col("p_name"), "aeiou", "_____").as("devoweled"),
        concat_ws("|", expr("regexp_extract_all(p_name, '[a-z]+', 0)"))
          .as("words_csv"),
        expr("regexp_count(p_name, '[aeiou]')").cast("int").as("n_vowels"),
        levenshtein(col("p_name"), lit("standard polished brass"))
          .as("edit_dist"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"),
        reverse(expr("repeat(split_part(p_name, ' ', 1), 2)"))
          .as("doubled_rev"))
      .orderBy("p_partkey")

  // ---------------------------------------------------------------- q231
  /** GAPS AND ISLANDS — maximal runs of CONSECUTIVE ACTIVE DAYS per user
    * (the streak metric behind engagement dashboards), via the classic
    * day − dense_rank(day) constant-per-island trick: consecutive days
    * advance both terms in lockstep, so the difference identifies the
    * island with zero self-joins. Complements q28's time-gap sessionize
    * (event-grained, gap threshold) with the calendar-grained dual.
    * Per-user windows over DISTINCT active days (≤ span days each);
    * integer day numbers from the raw-nanos contract — no calendar
    * surface. The longest island resolves by max(struct) argmax with an
    * earliest-start tie-break, all exact. */
  def q231GapsIslands(s: SparkSession, d: String): DataFrame = {
    val days = t(s, d, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("isl", col("day") - dense_rank().over(w))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      .groupBy("user_id")
      .agg(sum("len").as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(struct(col("len"), (-col("start_day")).as("ns"))).as("m"))
      .select(col("user_id"), col("n_active_days"), col("n_islands"),
        col("m.len").as("longest_streak"),
        (-col("m.ns")).as("longest_start_day"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q226
  /** CALENDAR ARITHMETIC — the date-math surface q04's field extraction
    * leaves untouched: month boundaries (last_day / add_months), ISO
    * week numbering, Monday-based weekday, month-offset arithmetic
    * against a fixed anchor, and a BUSINESS-DAYS-IN-MONTH count built
    * from a date `sequence` + weekday filter (the generator form — the
    * array is month-bounded, ≤31 elements, so the explode-free
    * `filter`+`size` stays a scalar projection). Everything is integer
    * or date-valued — no timezone or DST surface anywhere (dates are
    * calendar points, the engine-wide UTC pin covers the rest), so the
    * whole projection is exact in both engines. Weekday convention is
    * pinned to Monday=0 (Spark `weekday` ≡ DuckDB `isodow − 1`) — the
    * cross-engine Sunday-vs-Monday trap spelled out once. */
  def q226CalendarMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(pmod(col("o_orderkey"), lit(17)) === 0)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
      .select(
        col("o_orderkey"),
        col("od"),
        last_day(col("od")).as("last_dom"),
        dayofmonth(last_day(col("od"))).as("days_in_month"),
        weekday(col("od")).as("wd_mon0"),
        weekofyear(col("od")).as("iso_week"),
        add_months(trunc(col("od"), "month"), 1).as("next_month_start"),
        ((year(col("od")) - lit(1995)) * lit(12) + month(col("od")) - lit(1))
          .as("months_since_anchor"),
        size(filter(
          sequence(trunc(col("od"), "month"), last_day(col("od")),
            expr("interval 1 day")),
          x => weekday(x) < 5)).as("biz_days_in_month"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- q227
  /** MAP-TYPE surface — the collection type no other query exercises:
    * per user, a `map<string,long>` of event-type counts built with
    * map_from_entries over a SORTED entry array (map key order is
    * construction order, so sorting first makes every downstream
    * rendering deterministic), then the map-function family over it:
    * size, map_keys, element_at point lookup, map_filter predicate
    * subsetting, transform_values rescaling, and aggregate over
    * map_values. The oracle reproduces the same values relationally —
    * the MAP is engine-side representation, the CONTRACT is the values.
    * Shape: one groupBy(user, type) + one groupBy(user) with a bounded
    * entry array (|event types| entries) — map-side combinable, nothing
    * scales past the first aggregate. */
  def q227MapKv(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(pmod(col("user_id"), lit(11)) === 0)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        size(col("m")).as("n_types"),
        concat_ws(",", map_keys(col("m"))).as("types_csv"),
        // try_element_at, not element_at: ANSI mode (the Spark 4
        // default) makes element_at THROW on a missing key — a sampled
        // user with no clicks must report 0, not abort the query
        coalesce(expr("try_element_at(m, 'click')"), lit(0L)).as("clicks"),
        size(map_filter(col("m"), (_, v) => v >= 3L)).as("n_heavy_types"),
        aggregate(map_values(transform_values(col("m"), (_, v) => v * 2L)),
          lit(0L), (acc, x) => acc + x).as("double_total"))
      .orderBy("user_id")

  // ---------------------------------------------------------------- q228
  /** ARRAY SET-ALGEBRA surface — array_intersect / array_except /
    * array_union / array_position / flatten over per-user behavior sets:
    * the event types a user shows on EVEN days vs ODD days (a
    * deterministic, calendar-free split), compared as sets. Ordering
    * discipline: Spark's array set ops preserve LEFT-operand order, which
    * is construction-dependent — every emitted array goes through
    * array_sort (and the inputs are sorted collect_sets), so renderings
    * are engine-portable. The oracle rebuilds the same sets relationally
    * (sorted string_agg over distinct pairs) — semantics, not engine
    * list-function parity. One (user, parity, type)-grained distinct +
    * one user-grained fold; arrays are bounded by |event types|. */
  def q228ArrayAlgebra(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .filter(pmod(col("user_id"), lit(13)) === 0)
      .select(col("user_id"), col("event_type"),
        pmod(expr("(ts div 1000) div 86400000000"), lit(2)).as("par"))
      .distinct()
    e.groupBy("user_id")
      .agg(
        sort_array(collect_set(when(col("par") === 0, col("event_type"))))
          .as("a"),
        sort_array(collect_set(when(col("par") === 1, col("event_type"))))
          .as("b"))
      .select(
        col("user_id"),
        concat_ws(",", col("a")).as("even_csv"),
        concat_ws(",", col("b")).as("odd_csv"),
        concat_ws(",", array_sort(array_intersect(col("a"), col("b"))))
          .as("both_csv"),
        concat_ws(",", array_sort(array_except(col("b"), col("a"))))
          .as("odd_only_csv"),
        size(array_sort(array_union(col("a"), col("b")))).as("n_union"),
        // array_position returns 0 (not NULL) when absent — nullif
        // restores the NULL-when-missing contract the oracle states
        nullif(array_position(array_sort(array_union(col("a"), col("b"))),
          "click"), lit(0L)).cast("long").as("click_pos"),
        arrays_overlap(col("a"), col("b")).as("overlaps"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q05
  /** Math scalar functions. Transcendentals (sqrt/ln/pow) are rounded —
    * libm last-ulp differences across engines. */
  def q05ScalarMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(100)) === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(pow(col("l_discount"), 2), 8).as("disc_sq"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- q06
  /** Hash aggregate with the standard agg family. */
  def q06AggBasic(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        davg(col("o_totalprice")).as("avg_price"))
      .orderBy("o_orderstatus", "o_orderpriority")

  // ---------------------------------------------------------------- q07
  /** Distinct aggregates (Spark plans expand + two-phase agg). */
  def q07AggDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q08
  /** ROLLUP hierarchy totals; grouping NULLs mapped to a sentinel so the
    * oracle comparison never depends on engine NULL-ordering. */
  def q08Rollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy("status", "priority")

  // ---------------------------------------------------------------- q09
  /** CUBE over lineitem flags; sum(l_quantity) is integer-valued so exact. */
  def q09Cube(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  // ---------------------------------------------------------------- q10
  /** Fact-fact equi-join (shuffle hash/SMJ under AQE) + aggregate. */
  def q10JoinInnerAgg(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(drevenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------- q11
  /** TPC-H Q5-style star join: two fact tables + customer + broadcast
    * dimension chain (nation, region are O(10^1) rows at any SF). */
  def q11JoinStar(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val o = t(s, d, "orders")
      .filter(ntz(col("o_orderdate")) >= tsLit("1996-01-01T00:00:00") &&
        ntz(col("o_orderdate")) < tsLit("1998-01-01T00:00:00"))
    val c = t(s, d, "customer")
    val n = t(s, d, "nation")
    val r = t(s, d, "region").filter(col("r_name") === "EUROPE")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(drevenue.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---------------------------------------------------------------- q12
  /** Left outer join preserving customers with zero orders. */
  def q12JoinLeft(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast(DecimalType(18, 2))),
          lit(0).cast(DecimalType(18, 2))).cast("double").as("total_spent"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q13
  /** Left-semi join (EXISTS): customers with at least one big order. */
  def q13JoinSemi(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q14
  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  def q14JoinAnti(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q15
  /** Top-k: planned as TakeOrderedAndProject (no total sort, no full shuffle);
    * o_orderkey tie-break keeps the cut deterministic. */
  def q15TopK(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q16-q18 set ops
  def q16SetUnion(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("custkey"))
    val b = t(s, d, "orders").filter(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("custkey"))
    a.union(b).distinct().orderBy("custkey")
  }

  def q17SetIntersect(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "customer").filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    val b = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey"))
    a.intersect(b).orderBy("custkey")
  }

  def q18SetExcept(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "customer").filter(col("c_acctbal") > 8000)
      .select(col("c_custkey").as("custkey"))
    val b = t(s, d, "customer").filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
    a.except(b).orderBy("custkey")
  }

  // ---------------------------------------------------------------- q211
  /** BAG-SEMANTICS SET OPS — INTERSECT ALL / EXCEPT ALL, the multiplicity-
    * preserving variants q17/q18's DISTINCT forms do not cover: for a key
    * appearing m times on the left and n on the right, INTERSECT ALL
    * keeps min(m, n) copies and EXCEPT ALL keeps max(m − n, 0) — the SQL
    * standard's multiset algebra, which is what dedup-accounting queries
    * ("how many line items survive subtracting the flagged multiset?")
    * actually need. Output: per-key surviving multiplicities of both ops
    * over two overlapping lineitem projections.
    *
    * Scale: Catalyst plans both as a single hash aggregate per side
    * (count per key) + a replicate generate — one shuffle on the key, no
    * join; the grouped output here folds the replication straight back
    * into counts, so the exchange carries bare (key, count) pairs. */
  def q211SetOpsAll(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "lineitem").filter(col("l_quantity") >= 45)
      .select(col("l_orderkey").as("okey"))
    val b = t(s, d, "lineitem").filter(col("l_discount") >= 0.08)
      .select(col("l_orderkey").as("okey"))
    val ia = a.intersectAll(b).groupBy("okey")
      .agg(count(lit(1)).as("m"))
      .select(lit("intersect_all").as("op"), col("okey"), col("m"))
    val ea = a.exceptAll(b).groupBy("okey")
      .agg(count(lit(1)).as("m"))
      .select(lit("except_all").as("op"), col("okey"), col("m"))
    ia.unionAll(ea).orderBy("op", "okey")
  }

  // ---------------------------------------------------------------- q218
  /** GROUPING FLAGS — the part of the ROLLUP/CUBE surface q08/q09 leave
    * implicit: GROUPING() tells a subtotal row apart from a data row
    * whose key genuinely IS NULL — without it, rollup output is
    * ambiguous the moment a grouping column is nullable. The composed
    * gid (2·g(flag) + g(status)) labels each aggregation level
    * explicitly; keys coalesce to 'ALL' so ordering never touches
    * engine-divergent NULL placement (Spark sorts NULLS FIRST, DuckDB
    * NULLS LAST). Composing from single-column GROUPING() calls rather
    * than each engine's native grouping_id() sidesteps their different
    * bit conventions — parity by construction. */
  def q218GroupingFlags(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy("gid", "rflag", "lstatus")

  // ---------------------------------------------------------------- q213
  /** NOT IN vs NOT EXISTS UNDER NULLS — the three-valued-logic corner
    * every SQL engine must get right and most users get wrong once: a
    * NULL in the subquery makes `k NOT IN (...)` UNKNOWN for EVERY
    * candidate row (zero rows survive), while NOT EXISTS keeps its
    * two-valued semantics; filtering the subquery's NULLs restores rows
    * but still drops NULL-keyed outer rows (NULL NOT IN anything is
    * UNKNOWN); and the null-safe anti form (IS NOT DISTINCT FROM) is the
    * only variant that treats NULL as a matchable value. One summary row
    * certifies all four counts side by side over deterministically
    * planted NULLs (NULLIF on both sides). ONE SQL template serves the
    * engine (temp views) and the DuckDB oracle verbatim — parity by
    * construction, the q189/q27 discipline.
    *
    * Scale: Catalyst plans the NOT IN as a null-aware anti join and the
    * NOT EXISTS as a plain left-anti — both single-shuffle hash joins;
    * the counts are scalar subqueries over one scan each. */
  def q213SqlFor(ordersT: String, customerT: String): String =
    s"""WITH a AS (SELECT o_orderkey, NULLIF(o_custkey % 30, 7) AS k
       |           FROM $ordersT),
       |b AS (SELECT NULLIF(c_nationkey, 3) AS nk FROM $customerT)
       |SELECT
       | CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
       | CAST((SELECT count(*) FROM a WHERE k IS NULL) AS BIGINT) AS n_a_null,
       | CAST((SELECT count(*) FROM b WHERE nk IS NULL) AS BIGINT) AS n_b_null,
       | CAST((SELECT count(*) FROM a
       |       WHERE k NOT IN (SELECT nk FROM b)) AS BIGINT) AS n_not_in,
       | CAST((SELECT count(*) FROM a
       |       WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.nk = a.k)) AS BIGINT)
       |   AS n_not_exists,
       | CAST((SELECT count(*) FROM a
       |       WHERE k NOT IN (SELECT nk FROM b WHERE nk IS NOT NULL)) AS BIGINT)
       |   AS n_not_in_filtered,
       | CAST((SELECT count(*) FROM a
       |       WHERE NOT EXISTS (SELECT 1 FROM b
       |                         WHERE b.nk IS NOT DISTINCT FROM a.k)) AS BIGINT)
       |   AS n_null_safe_anti""".stripMargin

  def q213NotInNulls(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d, "orders").createOrReplaceTempView("graft_q213_orders")
    Tables.load(s, d, "customer").createOrReplaceTempView("graft_q213_customer")
    s.sql(q213SqlFor("graft_q213_orders", "graft_q213_customer"))
  }

  // ---------------------------------------------------------------- q19-q22 windows
  /** rank() per user by value; one shuffle on user_id, sort within. */
  def q19WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    t(s, d, "events")
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 5)
      .select("user_id", "event_id", "value", "rnk")
      .orderBy("user_id", "rnk", "event_id")
  }

  /** lag() deltas along each user's event timeline. */
  def q20WindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta", round(col("value") - col("prev_value"), 2))
      .select("event_id", "user_id", "value", "prev_value", "delta")
      .orderBy("event_id")
  }

  /** Running sum + row_number (cumulative frame). */
  def q21WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select(
        col("event_id"), col("user_id"),
        row_number().over(w).as("seq"),
        sum(col("value").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_value"))
      .orderBy("event_id")
  }

  /** Top-N per group via row_number — the scalable alternative to a
    * per-group sort+collect. */
  def q22WindowTopNPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    t(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "rn")
      .orderBy("l_orderkey", "rn")
  }

  // ---------------------------------------------------------------- q23
  /** `events.ts` arrives as a nanosecond Long (see Verify/Bench session
    * config): integer ns keeps ordering exact vs DuckDB's TIMESTAMP_NS;
    * truncate to micros only when a timestamp value is emitted. */
  // `div` = integer division: a double roundtrip would lose ns precision
  // (2^53 < ns-since-epoch), so this must stay in integer space.
  private def tsFromNanos(colName: String): Column =
    timestamp_micros(expr(s"$colName div 1000"))

  /** Tumbling 1h windows as a batch groupBy (streaming twin lives in
    * graft.streaming.EventsStream). date_trunc aligns with DuckDB. */
  def q23EventsHourly(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(
        ntz(date_trunc("hour", tsFromNanos("ts"))).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("hour_start", "event_type")

  // ---------------------------------------------------------------- q86
  /** HOPPING (sliding) windows — the built-in `window(col, size, slide)`
    * with a 1 h window advancing every 15 min, so each event lands in
    * size/slide = 4 overlapping windows. This is the smoothing rollup a
    * monitoring pipeline runs next to the tumbling q23: same single
    * shuffle on (window, event_type), with the 4× fan-out generated
    * MAP-SIDE by the window generator before the partial aggregate — at
    * 100 TB the exchange carries (n_windows × n_types) partial rows per
    * partition, not 4× the events. Spark aligns hop starts to the epoch,
    * so window_start = (tus div slide − k)·slide for k < size/slide —
    * integer µs math the oracle reproduces with a generate_series cross
    * join. Emitted as timestamp_ntz like every window key here. */
  def q86HoppingWindow(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(
        window(ntz(tsFromNanos("ts")), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("win_start", "event_type")

  // ---------------------------------------------------------------- q24
  /** JSON extraction from the props column + aggregate. */
  def q24EventsJson(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  // ---------------------------------------------------------------- q201
  /** VARIANT / semi-structured surface — q24's get_json_object covers
    * string-path JSON; this is Spark 4's binary-encoded VARIANT type:
    * build a NESTED document per event (object + array nesting, the
    * shape real ingestion sees), `parse_json` it into a variant column,
    * then typed `variant_get` path extraction and an aggregate over the
    * extracted fields. Construction uses only engine-identical
    * renderings (strings verbatim, integers via exact decimal cents —
    * never a raw double→string, whose formatting differs per engine), so
    * the DuckDB oracle re-parses the SAME text with its JSON functions
    * and the whole path is exact.
    *
    * Scale: parse-once-extract-many is the variant's point — one binary
    * parse per row, then O(1) typed path reads, all codegen'd
    * map-side; the aggregate is the only shuffle. */
  def q201VariantJson(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("props"))
      .withColumn("jtxt", concat(
        lit("{\"meta\":{\"t\":\""), col("event_type"), lit("\",\"k\":"),
        coalesce(get_json_object(col("props"), "$.k"), lit("null")),
        lit("},\"cents\":"), col("cents").cast("string"), lit("}")))
      .withColumn("v", parse_json(col("jtxt")))
      .select(
        expr("variant_get(v, '$.meta.t', 'string')").as("t"),
        expr("variant_get(v, '$.meta.k', 'int')").as("k"),
        expr("variant_get(v, '$.cents', 'bigint')").as("vcents"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        (sum("vcents") / 100.0).as("sum_value"))
      .orderBy("t")

  // ---------------------------------------------------------------- q203
  /** XML parse surface — `from_xml` (native in Spark 4), q201's variant
    * discipline applied to the other semi-structured format: build an XML
    * document per order from engine-identical renderings (integer keys,
    * exact decimal cents — never raw doubles), parse it back through a
    * typed schema, aggregate the EXTRACTED fields. DuckDB has no XML
    * functions, so the oracle computes the same aggregate from the base
    * columns directly — the construction is lossless by design, which
    * makes "parse roundtrip = identity" exactly the property under test:
    * any from_xml type-coercion or escaping bug diverges the aggregate.
    *
    * Scale: construct-and-parse is map-side codegen'd; the aggregate is
    * the only shuffle. */
  def q203XmlRoundtrip(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderstatus").as("st"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("o_orderkey").cast("string").as("key"))
      .withColumn("xml", concat(
        lit("<o><k>"), col("key"), lit("</k><p>"), col("cents").cast("string"),
        lit("</p><s>"), col("st"), lit("</s></o>")))
      .select(expr("from_xml(xml, 'k BIGINT, p BIGINT, s STRING')").as("r"))
      .groupBy(col("r.s").as("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("r.k")).as("sum_key"),
        (sum(col("r.p")) / 100.0).as("sum_price"))
      .orderBy("o_orderstatus")

  // ---------------------------------------------------------------- q254
  /** TYPED flatMapGroups — the 1→N face of the typed group API (mapGroups
    * q249 emits one row per key; this explodes each user's time-ordered
    * event sequence into INTER-EVENT GAP rows, the raw material of
    * arrival-process analysis). The fold sorts the group in the lambda —
    * legitimate here because a user's event count is bounded by behavior,
    * not corpus size (the q247 secondary sort is the shape when it
    * isn't). Gap rows are integer µs; the oracle restates the explosion
    * as a lag window. */
  def q254FlatMapGroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "events")
      .filter(pmod(col("user_id"), lit(29)) === 0)
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val ord = it.toSeq.sortBy(e => (e._2, e._3))
        ord.sliding(2).collect {
          case Seq((_, t1, _), (_, t2, id2)) => (uid, id2, t2 - t1)
        }
      }
      .toDF("user_id", "event_id", "gap_us")
      .orderBy("user_id", "event_id")
  }

  // ---------------------------------------------------------------- q255
  /** FILTER CLAUSE — per-aggregate predicates (`count(*) FILTER (WHERE
    * ...)`), the ANSI form that replaces a pile of CASE-WHEN-wrapped
    * aggregates; one pass, each aggregate sees its own row subset. */
  def q255FilterClause(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("graft_q255_orders")
    s.sql("""
      |SELECT o_orderstatus,
      |  count(*) AS n,
      |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
      |    AS urgent_total
      |FROM graft_q255_orders
      |GROUP BY o_orderstatus ORDER BY o_orderstatus
      |""".stripMargin)
  }

  // ---------------------------------------------------------------- q256
  /** LIMIT/OFFSET PAGINATION — page 3 of the price-ranked orders under a
    * TOTAL deterministic order (price desc, key): OFFSET is Spark 3.4+
    * SQL surface and the classic API-pagination shape. The scale note is
    * the point of the scaladoc: OFFSET n scans and discards n rows —
    * fine for UI pages, wrong for deep pagination, where the keyset form
    * (WHERE (price, key) < last-seen ORDER BY ... LIMIT k) keeps the
    * scan bounded; this query emits page 3 by BOTH forms and proves them
    * identical. */
  def q256Pagination(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("graft_q256_orders")
    s.sql("""
      |WITH page3 AS (
      |  SELECT o_orderkey, o_totalprice
      |  FROM graft_q256_orders
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20),
      |last2 AS (
      |  SELECT o_totalprice AS p, o_orderkey AS k
      |  FROM graft_q256_orders
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 19),
      |keyset AS (
      |  SELECT o.o_orderkey, o.o_totalprice
      |  FROM graft_q256_orders o CROSS JOIN last2
      |  WHERE o.o_totalprice < last2.p
      |     OR (o.o_totalprice = last2.p AND o.o_orderkey > last2.k)
      |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10)
      |SELECT p3.o_orderkey, p3.o_totalprice,
      |  (ks.o_orderkey IS NOT NULL) AS keyset_agrees
      |FROM page3 p3 LEFT JOIN keyset ks ON ks.o_orderkey = p3.o_orderkey
      |ORDER BY p3.o_totalprice DESC, p3.o_orderkey
      |""".stripMargin)
  }

  // ---------------------------------------------------------------- q257
  /** LEGACY LATERAL VIEW — the HiveQL generator syntax
    * (`LATERAL VIEW [OUTER] explode(...)`) that a decade of migrated
    * warehouse SQL still carries; semantically q235's explode/
    * explode_outer pair, spelled in the legacy dialect so migrations
    * run unmodified. The oracle restates it with unnest + the
    * closed-form outer contract. */
  def q257LateralView(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents").createOrReplaceTempView("graft_q257_docs")
    s.sql("""
      |SELECT lang,
      |  count(*) AS n_outer_rows,
      |  count(tok) AS n_tokens,
      |  count(*) - count(tok) AS n_empty_docs
      |FROM (
      |  SELECT lang, tok
      |  FROM graft_q257_docs
      |  LATERAL VIEW OUTER explode(
      |    filter(split(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+'),
      |      t -> t RLIKE 'z')) x AS tok)
      |GROUP BY lang ORDER BY lang
      |""".stripMargin)
  }

  // ---------------------------------------------------------------- q258
  /** SIGNED INTEGER-DIVISION SEMANTICS — the cross-engine contract every
    * oracle in this repo silently relies on, pinned as its own hashed
    * query: over a generated ± grid, `a div b` (truncating division),
    * `a % b` (sign of the dividend), and `pmod(a, b)` (always
    * non-negative). DuckDB's `//` and `%` follow the same truncation
    * convention; its pmod is restated as ((a % b) + b) % b. A regression
    * in either engine's semantics (or a wrong assumption in a future
    * oracle) breaks this hash first. */
  def q258IntDivSemantics(s: SparkSession, d: String): DataFrame =
    s.range(-7, 8).toDF("a")
      .crossJoin(s.range(1, 4).toDF("bb"))
      .select(col("a"), col("bb"),
        expr("a div bb").as("trunc_div"),
        expr("a % bb").as("rem"),
        pmod(col("a"), col("bb")).as("pm"),
        floor(col("a").cast("double") / col("bb").cast("double"))
          .cast("long").as("floor_div"))
      .orderBy("a", "bb")

  // ---------------------------------------------------------------- q253
  /** ORDERED-SET AGGREGATES — Spark 4's listagg WITHIN GROUP (the ANSI
    * ordered string aggregation q47 emulated with sort_array+concat_ws)
    * and deterministic mode(expr, true) (ties resolve to the LOWEST
    * value — the documented rule, which the oracle restates as a
    * (count desc, value asc) rank so a tie-rule regression breaks the
    * hash). Both are single-pass aggregates; listagg's buffer is
    * group-sized, so the demo keys on a sampled subset — at 100 TB you
    * cap or bucket the list, never aggregate an unbounded string. */
  def q253OrderedAgg(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .filter(pmod(col("o_orderkey"), lit(500)) === 0)
      .createOrReplaceTempView("graft_q253_orders")
    s.sql("""
      |SELECT o_orderstatus,
      |  listagg(o_orderpriority, '|')
      |    WITHIN GROUP (ORDER BY o_orderpriority, o_orderkey) AS pri_list,
      |  mode(o_orderpriority, true) AS mode_pri,
      |  count(*) AS n
      |FROM graft_q253_orders
      |GROUP BY o_orderstatus ORDER BY o_orderstatus
      |""".stripMargin)
  }

  // ---------------------------------------------------------------- q252
  /** XPATH EXTRACTION — the q203 XML surface's query-side face: where
    * from_xml schema-parses a whole document, the xpath_* built-ins pull
    * single values by path expression (the form ad-hoc XML ETL actually
    * writes): xpath_string / xpath_long / xpath_boolean plus the
    * node-list form xpath(...) whose hit COUNT survives aggregation.
    * Documents are the engine-identical q203 renderings; the oracle
    * re-derives every extracted value from the SOURCE columns — the
    * roundtrip contract is "extraction inverts construction", and any
    * path/namespace/cast bug in the xpath kernel breaks the hash. */
  def q252XpathExtract(s: SparkSession, d: String): DataFrame =
    // spread: per-row XML render + four JAXP xpath evaluations are the
    // compute stage (sf1: 14 s nearly-single-task unspread)
    graft.Tables.spread(
      t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(50)) === 0),
      "o_orderkey")
      .select(col("o_orderkey"),
        col("o_orderstatus").as("st"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("cents"))
      .withColumn("xml", concat(
        lit("<o><k>"), col("o_orderkey").cast("string"),
        lit("</k><p>"), col("cents").cast("string"),
        lit("</p><s>"), col("st"), lit("</s></o>")))
      .select(col("o_orderkey"),
        expr("xpath_string(xml, '/o/s')").as("status"),
        expr("xpath_long(xml, '/o/p')").as("price_cents"),
        expr("xpath_boolean(xml, '/o/s[.=\"F\"]')").as("is_f"),
        expr("size(xpath(xml, '/o/*'))").cast("int").as("n_children"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- q25
  /** Backward as-of join: each click annotated with the user's most recent
    * purchase at-or-before it. See AsofJoin for the single-sort plan. */
  def q25AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"), col("value").as("purchase_value"))
    AsofJoin.backward(
      clicks, purchases,
      key = "user_id", time = "ts",
      attach = Seq("purchase_event_id", "purchase_value"))
      .select("event_id", "user_id", "purchase_event_id", "purchase_value")
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q26
  /** Non-equi range join against a tiny in-query band dimension —
    * broadcast nested-loop, the right plan when one side is O(1) rows.
    * (At 100 TB with a large band table you'd bin the fact side to the
    * band grid and equi-join on the bin instead.) */
  def q26RangeBandJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (0, "b0", 0.0, 100000.0),
      (1, "b1", 100000.0, 200000.0),
      (2, "b2", 200000.0, 300000.0),
      (3, "b3", 300000.0, 400000.0),
      (4, "b4", 400000.0, 1000000000.0))
      .toDF("band_id", "band_name", "lo", "hi")
    t(s, d, "orders")
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band_id", "band_name")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("band_id")
  }

  // ---------------------------------------------------------------- q27
  /** GROUPING SETS via the spark.sql surface (DataFrame API has rollup/cube;
    * arbitrary sets are SQL-only). One SQL template, two table names: the
    * oracle reads DuckDB's `orders`, the Spark side a NAMESPACED temp view
    * (graft_q27_orders) so running q27 never clobbers a user-registered
    * `orders` view in the shared session catalog. */
  def q27SqlFor(table: String): String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
       |       coalesce(CAST(year(o_orderdate) AS INT), -1) AS o_year,
       |       count(*) AS n,
       |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       |FROM $table
       |GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
       |ORDER BY status, o_year""".stripMargin

  def q27GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d, "orders").createOrReplaceTempView("graft_q27_orders")
    s.sql(q27SqlFor("graft_q27_orders"))
  }

  // ---------------------------------------------------------------- q28
  /** Gap-based sessionization (30 min inactivity) as a batch query: lag
    * marks session starts, a running sum numbers sessions, then one
    * aggregate per session. Gap math stays in integer microseconds so the
    * oracle comparison is exact. Streaming twin (flatMapGroupsWithState):
    * graft.streaming.EventsStream.sessionize. */
  def q28Sessionize(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events").select(col("event_id"), col("user_id"),
      col("value"), expr("ts div 1000").as("tus"))
    graft.streaming.EventsStream.sessionizeByGapUs(e, gapUs = 30L * 60 * 1000 * 1000)
      .select(col("user_id"), col("session_seq"),
        ntz(timestamp_micros(col("start_us"))).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  // ---------------------------------------------------------------- q83
  /** Sessionization via the BUILT-IN `session_window` aggregation — the
    * declarative twin of q28's lag+running-sum formulation (and the third
    * implementation of the one session contract, after the stateful
    * stream q60). One subtlety makes them bit-equal rather than
    * almost-equal: `session_window(ts, g)` spans [t, t+g) and merges a
    * successor only when diff < g STRICTLY, while the gap definition
    * merges at diff <= gap; at integer-microsecond resolution
    * `g = gap + 1us` makes "diff < g" and "diff <= gap" the same
    * predicate, so the query shares q28's exact oracle BY CONSTRUCTION —
    * no reliance on the corpus lacking exactly-gap-spaced events.
    * Plan-wise this is one hash aggregate over (user, merged window) after
    * Spark's session-merge pass — the engine-native shape a user should
    * reach for first; session_seq is re-derived by one window over the
    * (small) per-session output. */
  def q83SessionWindow(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val e = t(s, d, "events").select(col("user_id"), col("value"),
      timestamp_micros(expr("ts div 1000")).as("ets"))
    val agg = e
      .groupBy(col("user_id"),
        session_window(col("ets"), s"${gapUs + 1} microseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
    val w = Window.partitionBy("user_id").orderBy(col("sw.start"))
    agg
      .withColumn("session_seq", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_seq"),
        ntz(col("sw.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  // ---------------------------------------------------------------- q57
  /** RANGE-framed window: 10-minute rolling event-time aggregate per user —
    * the time-based sibling of q21's ROWS frame, and the engine's
    * deliberate RANGE BETWEEN surface query. Frame bounds are integer
    * microseconds (exact in both engines).
    *
    * Density caveat (r11): Spark's sliding frames re-aggregate per row
    * (no retraction) — O(rows × rows-per-window) per partition. Fine
    * here (per-USER 10-minute frames stay small at any corpus size);
    * for per-TYPE trailing windows over a dense stream use q217's
    * grid-cumsum + as-of formulation, which is linear. */
  def q57WindowRange(s: SparkSession, d: String): DataFrame = {
    val tenMinUs = 10L * 60 * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-tenMinUs, 0)
    t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts div 1000").as("tus"))
      .select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_10min"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("sum_10min"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q220
  /** WINDOW BUILT-INS completion — the ranking/navigation functions the
    * q19–q22/q57 family doesn't exercise: ntile (equi-count bucketing),
    * percent_rank / cume_dist (relative standing), nth_value over an
    * unbounded frame (frame navigation), and lag(... IGNORE NULLS) (the
    * "most recent qualifying prior row" idiom — here each order's
    * previous BIG order from the same customer, the classic marketing
    * recency feature).
    *
    * Determinism: every window orders by a UNIQUE key pair, so rank-based
    * values are exact integers-over-integers (one division per row,
    * identical in both engines) and ntile/nth_value pick identical rows.
    * Scale: two window partitionings (status, customer) — each a single
    * hash exchange + in-partition sort, no self-joins; IGNORE NULLS is a
    * running last-non-null, linear per partition. */
  def q220WindowExtras(s: SparkSession, d: String): DataFrame = {
    val wRank = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = wRank
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(wRank).as("price_quartile"),
        percent_rank().over(wRank).as("pr"),
        cume_dist().over(wRank).as("cd"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_cheapest_key"),
        first(col("o_orderkey")).over(wFull).as("cheapest_key"),
        lag(when(col("o_totalprice") > 250000.0, col("o_orderkey")),
          1, null, ignoreNulls = true).over(wCust).as("prev_big_key"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  // ---------------------------------------------------------------- q58
  /** Conditional scalar surface: CASE tiers, nullif/coalesce, least/greatest. */
  def q58Conditionals(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("segment"),
        least(col("c_acctbal"), lit(9000.0)).as("capped_bal"),
        greatest(col("c_acctbal"), lit(0.0)).as("floored_bal"))
      .orderBy("c_custkey")

  // ---------------------------------------------------------------- q59
  /** TPC-H Q2-flavored min-cost-supplier pick, closing the part/supplier
    * coverage hole: lineitem is the part-supplier price relation (this
    * schema has no partsupp), aggregated to a per-(part, supplier) floor
    * price, restricted to EUROPE suppliers through the broadcast dimension
    * chain (nation, region are O(10) rows at any SF), then a per-part
    * window picks the cheapest supplier (price, then suppkey tie-break).
    *
    * Scale shape: the only fact-sized shuffles are the (l_partkey,
    * l_suppkey) partial+final aggregate and the window's hash partition on
    * p_partkey. Only nation and region carry broadcast HINTS — they are
    * the SF-invariant dims. supplier and part grow linearly with SF
    * (supplier = SF·10k rows: catalog-sized at sf0.1, billions at
    * 100 TB), so their joins are left to the optimizer: AQE broadcasts
    * them while they measure under the threshold and falls back to a
    * shuffle join once they don't — a forced hint would bypass that
    * guard and hit the broadcast ceiling at scale. min() is order-free,
    * so no decimal dance is needed. */
  def q59MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val costs = t(s, d, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    val sup = t(s, d, "supplier")
    val n = t(s, d, "nation")
    val r = t(s, d, "region").filter(col("r_name") === "EUROPE")
    val p = t(s, d, "part").filter(col("p_size") <= 15 && col("p_type") === "ECONOMY")
    val eligible = costs
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("min_price"), col("l_suppkey"))
    eligible
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name").as("supp_nation"), col("min_price"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- q94
  /** Distribution-RANK feature family — ntile / percent_rank / cume_dist
    * per market segment over account balance, the quantile-position
    * features a feature-engineering pass attaches before binning or
    * calibration. One window per key (single shuffle on segment +
    * streaming per-partition sort). The ordering includes the unique
    * custkey tiebreak, so every rank function is total-order
    * deterministic; percent_rank and cume_dist are then single IEEE
    * divides of exact integer positions — engine-exact without any
    * rounding. */
  def q94RankFeatures(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
  }

  // ---------------------------------------------------------------- q54
  /** q22's semantics through the custom physical operator
    * (graft.plans.TopKPerGroupExec): bounded per-group heaps with a
    * map-side partial pass, instead of the window translation's full
    * per-partition sort. Shares q22's oracle — identical results. */
  def q54TopKPerGroupNative(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.perGroup(
      t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
      groupCols = Seq("l_orderkey"),
      orderBy = Seq(("l_extendedprice", false), ("l_linenumber", true)),
      k = 3, rankName = "rn")
      .orderBy("l_orderkey", "rn")

  // ---------------------------------------------------------------- q189
  /** CORRELATED SUBQUERY SURFACE — the decorrelation member of the SQL
    * family (q27 covers GROUPING SETS): two correlated scalar subqueries
    * plus a correlated EXISTS in one statement, the TPC-H Q17 shape
    * ("small-quantity" lineitems = rows whose quantity is below 1/5 of
    * their part's average) restated in integer arithmetic so the
    * threshold compare is exact in both engines: `floor(qty) * 5 * cnt <
    * sum_qty` instead of a float `0.2 * avg`. floor-then-CAST, not a bare
    * CAST — Spark truncates double→BIGINT while DuckDB rounds half-even,
    * so a bare CAST would silently diverge on any non-integral quantity;
    * floor() pins one semantics in both engines (quantities are integral
    * 1..50 today, but the template must not depend on that).
    *
    * Scale: Catalyst does NOT execute correlated subqueries per row — it
    * decorrelates. RewriteCorrelatedScalarSubquery turns each scalar into
    * ONE aggregate over lineitem grouped by l_partkey joined back on the
    * correlation key, and the EXISTS becomes a left-semi join on
    * o_orderkey; the physical plan is three shuffles over key-pruned
    * columns, no nested-loop anywhere (plan-asserted in the spec). The
    * oracle runs the IDENTICAL SQL text on DuckDB (q27's one-template
    * discipline), so engine parity is by construction. */
  def q189SqlFor(li: String, pt: String, od: String): String =
    s"""SELECT p.p_brand,
       |       count(*) AS n_small,
       |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
       |         AS small_revenue
       |FROM $li l JOIN $pt p ON l.l_partkey = p.p_partkey
       |WHERE CAST(floor(l.l_quantity) AS BIGINT) * 5 *
       |        (SELECT count(*) FROM $li l2
       |         WHERE l2.l_partkey = l.l_partkey)
       |      < (SELECT CAST(sum(CAST(floor(l3.l_quantity) AS BIGINT)) AS BIGINT)
       |         FROM $li l3 WHERE l3.l_partkey = l.l_partkey)
       |  AND EXISTS (SELECT 1 FROM $od o
       |              WHERE o.o_orderkey = l.l_orderkey
       |                AND o.o_orderstatus <> 'P')
       |GROUP BY p.p_brand
       |ORDER BY p.p_brand""".stripMargin

  def q189CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    t(s, d, "lineitem").createOrReplaceTempView("graft_q189_lineitem")
    t(s, d, "part").createOrReplaceTempView("graft_q189_part")
    t(s, d, "orders").createOrReplaceTempView("graft_q189_orders")
    s.sql(q189SqlFor("graft_q189_lineitem", "graft_q189_part",
      "graft_q189_orders"))
  }

  /** The hand-decorrelated DataFrame-API twin of q189 — what Catalyst's
    * rewrite should produce. The spec pins SQL ≡ this form row-for-row. */
  def q189DecorrelatedTwin(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("l_quantity")).cast("long")).as("sum_qty"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(floor(col("l_quantity")).cast("long") * 5 * col("cnt") < col("sum_qty"))
      .join(t(s, d, "orders").filter(col("o_orderstatus") =!= "P")
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      // no broadcast hint: part grows with SF (only nation/region are
      // SF-invariant) — AQE broadcasts it while small, shuffles past that
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        dsum(col("l_extendedprice")).as("small_revenue"))
      .orderBy("p_brand")
  }

  // ---------------------------------------------------------------- q194
  /** RECURSIVE CTE SURFACE — `WITH RECURSIVE` through spark.sql, the
    * iteration primitive SQL users reach for before they ever see a
    * DataFrame loop (Spark 4's UnionLoop execution; our GraphOps loops
    * hand-roll the same shape with localCheckpoint). The walk follows
    * each customer's order chain in date order, accumulating spend in
    * DECIMAL(18,2) with an explicit re-CAST per step so the anchor and
    * recursive arms keep ONE type (decimal addition widens precision,
    * and a recursive union must not). The fixpoint provably equals the
    * one-pass per-customer aggregate (chain end = all orders), which is
    * what the spec pins — so the recursion's correctness is checked
    * against closed form, and the oracle runs the IDENTICAL SQL text in
    * DuckDB (q27/q189's one-template discipline).
    *
    * Scale: UnionLoop executes level-by-level; level k joins the
    * previous level's survivors (customers with ≥k orders — a set that
    * only SHRINKS) against the rn-indexed chain relation on (ck, rn) —
    * key-only equi-joins, no growing state beyond the accumulated
    * output. Depth is bounded by max orders per customer (25 at test
    * SFs; ~200 on the skewed edge corpus's hot customers — the session
    * raises spark.sql.cteRecursionLevelLimit past the 100 default, which
    * crashed the walk where DuckDB kept going; see Graft.sessionBuilder). */
  /** The rn-indexed chain relation (shared text fragment). */
  def q194ChainSql(od: String): String =
    s"""SELECT o_custkey AS ck, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
       |  row_number() OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey) AS rn
       | FROM $od""".stripMargin

  /** The recursive walk over a chain relation (shared text fragment). */
  def q194WalkSqlFor(ch: String): String =
    s"""WITH RECURSIVE walk AS (
       | SELECT ck, rn, p AS cum FROM $ch WHERE rn = 1
       | UNION ALL
       | SELECT c.ck, c.rn, CAST(w.cum + c.p AS DECIMAL(18,2)) AS cum
       | FROM walk w JOIN $ch c ON c.ck = w.ck AND c.rn = w.rn + 1)
       |SELECT ck AS custkey, CAST(max(rn) AS BIGINT) AS chain_len,
       | CAST(max(cum) AS DOUBLE) AS total_spend
       |FROM walk GROUP BY ck ORDER BY custkey""".stripMargin

  /** One-statement form (the oracle face), composed from the SAME two
    * fragments the engine runs, so the texts can never drift. */
  def q194SqlFor(od: String): String =
    q194WalkSqlFor("ch").replaceFirst("WITH RECURSIVE ",
      s"WITH RECURSIVE ch AS (\n${q194ChainSql(od)}),\n")

  def q194RecursiveCte(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("graft_q194_orders")
    // materialize the windowed chain ONCE: a CTE referenced inside the
    // recursion is re-planned per UnionLoop level — 25 levels re-ran the
    // row_number window over orders 25 times (measured 9.2 s → see
    // ROUNDLOG; the checkpoint turns each level into a key-only join
    // against a materialized relation)
    // pre-partition + sort the chain on the walk's join key before the
    // cut (optimization r13, the q105 adjacency finding): every UnionLoop
    // level joins this static relation on (ck, rn); the level plans still
    // carry an Exchange (a checkpoint's LogicalRDD reports
    // UnknownPartitioning under AQE) but ReuseExchange writes it once and
    // the per-level fetches ship sorted-run-compressed bytes, and each
    // level's chain-side sort starts from sorted runs
    val ch = graft.Transients.track(
      s.sql(q194ChainSql("graft_q194_orders"))
        .repartition(col("ck"), col("rn")).sortWithinPartitions("ck", "rn")
        .transform(graft.Transients.cut))
    ch.createOrReplaceTempView("graft_q194_ch")
    s.sql(q194WalkSqlFor("graft_q194_ch"))
  }

  /** Closed form of the q194 fixpoint: the chain end accumulates every
    * order, so the walk must land on the per-customer aggregate. */
  def q194ClosedFormTwin(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("chain_len"), dsum(col("o_totalprice")).as("total_spend"))
      .orderBy("custkey")

  // ---------------------------------------------------------------- q198
  /** LATERAL JOIN SURFACE — the correlated table-subquery member of the
    * SQL family (q189 covers scalar/EXISTS correlation, q194 recursion):
    * for each region, the top-2 nations by customer count via a LATERAL
    * subquery carrying its own aggregate, ORDER BY and LIMIT — the
    * "top-N per outer row" idiom every reporting layer writes. Catalyst
    * decorrelates the lateral into a window-ranked join (no per-row
    * re-execution); the deterministic (count, name) tiebreak keeps the
    * LIMIT exact, and the oracle runs the IDENTICAL SQL text in DuckDB.
    *
    * Scale: the outer side is catalog-sized here, but the decorrelated
    * plan is the same rank-filter shape as q22/q54 — per-group top-N
    * without re-running the inner query per outer row. */
  def q198SqlFor(rg: String, nt: String, ct: String): String =
    s"""SELECT r.r_name, t.n_name, t.n_cust
       |FROM $rg r, LATERAL (
       |  SELECT n.n_name, count(c.c_custkey) AS n_cust
       |  FROM $nt n LEFT JOIN $ct c ON c.c_nationkey = n.n_nationkey
       |  WHERE n.n_regionkey = r.r_regionkey
       |  GROUP BY n.n_name
       |  ORDER BY n_cust DESC, n.n_name
       |  LIMIT 2) t
       |ORDER BY r.r_name, t.n_cust DESC, t.n_name""".stripMargin

  def q198LateralJoin(s: SparkSession, d: String): DataFrame = {
    t(s, d, "region").createOrReplaceTempView("graft_q198_region")
    t(s, d, "nation").createOrReplaceTempView("graft_q198_nation")
    t(s, d, "customer").createOrReplaceTempView("graft_q198_customer")
    s.sql(q198SqlFor("graft_q198_region", "graft_q198_nation",
      "graft_q198_customer"))
  }

  // ------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_scalar_string" -> (q03ScalarString _),
    "q04_scalar_date" -> (q04ScalarDate _),
    "q226_calendar_math" -> (q226CalendarMath _),
    "q227_map_kv" -> (q227MapKv _),
    "q228_array_algebra" -> (q228ArrayAlgebra _),
    "q230_string_toolkit" -> (q230StringToolkit _),
    "q231_gaps_islands" -> (q231GapsIslands _),
    "q232_cogroup_recon" -> (q232CogroupRecon _),
    "q234_observe_metrics" -> (q234ObserveMetrics _),
    "q235_generator_semantics" -> (q235GeneratorSemantics _),
    "q240_sql_sugar" -> (q240SqlSugar _),
    "q242_try_arithmetic" -> (q242TryArithmetic _),
    "q243_bitwise_ops" -> (q243BitwiseOps _),
    "q249_map_groups" -> (q249MapGroups _),
    "q252_xpath_extract" -> (q252XpathExtract _),
    "q253_ordered_agg" -> (q253OrderedAgg _),
    "q254_flatmap_groups" -> (q254FlatMapGroups _),
    "q255_filter_clause" -> (q255FilterClause _),
    "q256_pagination" -> (q256Pagination _),
    "q257_lateral_view" -> (q257LateralView _),
    "q258_intdiv_semantics" -> (q258IntDivSemantics _),
    "q05_scalar_math" -> (q05ScalarMath _),
    "q06_agg_basic" -> (q06AggBasic _),
    "q07_agg_distinct" -> (q07AggDistinct _),
    "q08_rollup" -> (q08Rollup _),
    "q09_cube" -> (q09Cube _),
    "q10_join_inner_agg" -> (q10JoinInnerAgg _),
    "q11_join_star" -> (q11JoinStar _),
    "q12_join_left" -> (q12JoinLeft _),
    "q13_join_semi" -> (q13JoinSemi _),
    "q14_join_anti" -> (q14JoinAnti _),
    "q15_topk" -> (q15TopK _),
    "q16_set_union" -> (q16SetUnion _),
    "q211_set_ops_all" -> (q211SetOpsAll _),
    "q213_not_in_nulls" -> (q213NotInNulls _),
    "q218_grouping_flags" -> (q218GroupingFlags _),
    "q17_set_intersect" -> (q17SetIntersect _),
    "q18_set_except" -> (q18SetExcept _),
    "q19_window_rank" -> (q19WindowRank _),
    "q20_window_lag" -> (q20WindowLag _),
    "q21_window_running" -> (q21WindowRunning _),
    "q22_window_topn_group" -> (q22WindowTopNPerGroup _),
    "q23_events_hourly" -> (q23EventsHourly _),
    "q86_hopping_window" -> (q86HoppingWindow _),
    "q24_events_json" -> (q24EventsJson _),
    "q25_asof_join" -> (q25AsofJoin _),
    "q26_range_band_join" -> (q26RangeBandJoin _),
    "q27_grouping_sets" -> (q27GroupingSets _),
    "q28_sessionize" -> (q28Sessionize _),
    "q83_session_window" -> (q83SessionWindow _),
    "q54_topk_group_native" -> (q54TopKPerGroupNative _),
    "q57_window_range" -> (q57WindowRange _),
    "q220_window_extras" -> (q220WindowExtras _),
    "q94_rank_features" -> (q94RankFeatures _),
    "q58_conditionals" -> (q58Conditionals _),
    "q59_min_cost_supplier" -> (q59MinCostSupplier _),
    "q189_correlated_subquery" -> (q189CorrelatedSubquery _),
    "q194_recursive_cte" -> (q194RecursiveCte _),
    "q198_lateral_join" -> (q198LateralJoin _),
    "q201_variant_json" -> (q201VariantJson _),
    "q203_xml_roundtrip" -> (q203XmlRoundtrip _))

  private val topNPerGroupOracle: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, CAST(rn AS INT) AS rn FROM (
      | SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      | FROM lineitem) WHERE rn <= 3
      |ORDER BY l_orderkey, rn""".stripMargin

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | round(sum(l_quantity), 2) AS sum_qty,
         | ${sqlDsum("l_extendedprice")} AS sum_base_price,
         | $sqlRevenue AS sum_disc_price,
         | $sqlCharge AS sum_charge,
         | round(avg(l_quantity), 4) AS avg_qty,
         | ${sqlDavg("l_extendedprice")} AS avg_price,
         | ${sqlDavg("l_discount")} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_quantity >= 48 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_scalar_string" ->
      """SELECT doc_id,
        | upper(substring(text, 1, 20)) AS head_upper,
        | CAST(length(text) AS INT) AS len_chars,
        | CAST(strpos(text, 'spark') AS INT) AS spark_pos,
        | concat_ws('|', lang, source) AS lang_src
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q04_scalar_date" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(quarter(o_orderdate) AS INT) AS o_quarter,
        | CAST(month(o_orderdate) AS INT) AS o_month,
        | CAST(day(o_orderdate) AS INT) AS o_day,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey""".stripMargin,
    // the 1→N explosion restated as a lag window (gap rides the later
    // event; the first event's NULL gap is filtered on both sides)
    "q254_flatmap_groups" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id
        | FROM events WHERE user_id % 29 = 0),
        |g AS (
        | SELECT user_id, event_id,
        |  tus - lag(tus) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS gap_us
        | FROM e)
        |SELECT user_id, event_id, CAST(gap_us AS BIGINT) AS gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,
    // identical FILTER clause syntax in DuckDB
    "q255_filter_clause" ->
      """SELECT o_orderstatus,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
        |   AS n_big,
        | CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |   AS BIGINT) AS n_urgent,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
        |   AS urgent_total
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // same page by both forms; keyset_agrees TRUE row-for-row
    "q256_pagination" ->
      """WITH page3 AS (
        | SELECT o_orderkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20),
        |last2 AS (
        | SELECT o_totalprice AS p, o_orderkey AS k FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 19),
        |keyset AS (
        | SELECT o.o_orderkey, o.o_totalprice
        | FROM orders o CROSS JOIN last2
        | WHERE o.o_totalprice < last2.p
        |    OR (o.o_totalprice = last2.p AND o.o_orderkey > last2.k)
        | ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10)
        |SELECT p3.o_orderkey, p3.o_totalprice,
        | (ks.o_orderkey IS NOT NULL) AS keyset_agrees
        |FROM page3 p3 LEFT JOIN keyset ks ON ks.o_orderkey = p3.o_orderkey
        |ORDER BY p3.o_totalprice DESC, p3.o_orderkey""".stripMargin,
    // the legacy generator restated with the q235 closed-form contract
    "q257_lateral_view" ->
      """WITH base AS (
        | SELECT lang,
        |  list_filter(
        |   regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+'),
        |   t -> regexp_matches(t, 'z')) AS z
        | FROM documents)
        |SELECT lang,
        | CAST(sum(greatest(coalesce(len(z), 0), 1)) AS BIGINT)
        |   AS n_outer_rows,
        | CAST(sum(coalesce(len(z), 0)) AS BIGINT) AS n_tokens,
        | CAST(sum(CASE WHEN coalesce(len(z), 0) = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_empty_docs
        |FROM base GROUP BY lang ORDER BY lang""".stripMargin,
    // DuckDB's // truncates toward zero and % carries the dividend's
    // sign — probed, and now pinned by this hash forever
    "q258_intdiv_semantics" ->
      """WITH a AS (SELECT x AS a FROM range(-7, 8) t(x)),
        |b AS (SELECT x AS bb FROM range(1, 4) t(x))
        |SELECT a, bb,
        | CAST(a // bb AS BIGINT) AS trunc_div,
        | CAST(a % bb AS BIGINT) AS rem,
        | CAST(((a % bb) + bb) % bb AS BIGINT) AS pm,
        | CAST(floor(CAST(a AS DOUBLE) / bb) AS BIGINT) AS floor_div
        |FROM a CROSS JOIN b ORDER BY a, bb""".stripMargin,
    // string_agg with the same ORDER BY; mode's documented lowest-wins
    // tie rule restated as a (count desc, value asc) rank
    "q253_ordered_agg" ->
      """WITH f AS (
        | SELECT o_orderstatus, o_orderpriority, o_orderkey
        | FROM orders WHERE o_orderkey % 500 = 0),
        |g AS (
        | SELECT o_orderstatus,
        |  string_agg(o_orderpriority, '|'
        |    ORDER BY o_orderpriority, o_orderkey) AS pri_list,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM f GROUP BY 1),
        |m AS (
        | SELECT o_orderstatus, o_orderpriority AS mode_pri,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY count(*) DESC, o_orderpriority) AS rk
        | FROM f GROUP BY o_orderstatus, o_orderpriority)
        |SELECT g.o_orderstatus, g.pri_list, m.mode_pri, g.n
        |FROM g JOIN m ON m.o_orderstatus = g.o_orderstatus AND m.rk = 1
        |ORDER BY g.o_orderstatus""".stripMargin,
    // extraction inverts construction: every xpath value re-derived from
    // the source columns directly
    "q252_xpath_extract" ->
      """SELECT o_orderkey,
        | o_orderstatus AS status,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |   AS price_cents,
        | (o_orderstatus = 'F') AS is_f,
        | CAST(3 AS INT) AS n_children
        |FROM orders WHERE o_orderkey % 50 = 0
        |ORDER BY o_orderkey""".stripMargin,
    // order-insensitive typed fold restated as plain aggregates; the id
    // xor matches bit_xor exactly
    "q249_map_groups" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(c) AS BIGINT) AS sum_c,
        | CAST(min(c) AS BIGINT) AS min_c,
        | CAST(max(c) AS BIGINT) AS max_c,
        | CAST(bit_xor(event_id) AS BIGINT) AS xor_ids
        |FROM (SELECT event_type, event_id,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the CONTRACT stated directly: expected values including the NULLs
    // (DuckDB would ERROR on the failing forms — that IS the difference)
    "q242_try_arithmetic" ->
      """SELECT l_orderkey,
        | l_extendedprice / l_quantity AS ok_div,
        | CAST(NULL AS DOUBLE) AS null_div,
        | CAST(NULL AS INT) AS null_cast,
        | l_orderkey AS ok_cast,
        | CAST(NULL AS BIGINT) AS null_overflow,
        | l_orderkey * 2 AS ok_mult
        |FROM lineitem
        |WHERE l_orderkey % 100 = 0 AND l_orderkey > 0
        |  AND l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin,
    // pure integer bit algebra, identical in both engines
    "q243_bitwise_ops" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | CAST(bit_and(l_linenumber) AS BIGINT) AS and_line,
        | CAST(bit_or(l_linenumber) AS BIGINT) AS or_line,
        | CAST(bit_xor(l_orderkey) AS BIGINT) AS xor_keys,
        | CAST(bit_or(CAST(1 AS BIGINT) << CAST(l_linenumber % 7 AS INT))
        |   AS BIGINT) AS line_mask
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // DuckDB's spelling of the identical sugar (VALUES list, range() TVF,
    // GROUP BY ALL, ORDER BY ALL)
    "q240_sql_sugar" ->
      """WITH labels(band, label) AS (
        |  VALUES (0, 'low'), (1, 'mid'), (2, 'high')),
        |bands AS (
        |  SELECT t.b AS band, l.label
        |  FROM range(3) t(b) JOIN labels l ON l.band = t.b),
        |e AS (
        |  SELECT event_type, user_id,
        |    least(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      // 2500, 2) AS band
        |  FROM events)
        |SELECT e.event_type, b.label, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN bands b ON b.band = e.band
        |GROUP BY ALL ORDER BY ALL""".stripMargin,
    // the oracle is the direct aggregate — hash-equality proves the
    // observe side-channel saw every row exactly once
    // coalesce(·, 0): the engine's observe-metrics row reports empty-input
    // sums/extremes as 0 (explicit contract) — mirror it
    "q234_observe_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(coalesce(sum(c), 0) AS BIGINT) AS sum_c,
        | CAST(coalesce(min(c), 0) AS BIGINT) AS min_c,
        | CAST(coalesce(max(c), 0) AS BIGINT) AS max_c,
        | CAST(coalesce(sum(CASE WHEN c < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |   AS n_negative
        |FROM (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |        AS c FROM events)""".stripMargin,
    // the oracle states the generator CONTRACT closed-form: inner rows =
    // Σ len, outer rows = Σ max(len, 1), null rows = empty-array docs
    "q235_generator_semantics" ->
      """WITH base AS (
        | SELECT lang,
        |  list_filter(
        |   regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+'),
        |   tk -> contains(tk, 'z')) AS ztoks
        | FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN coalesce(len(ztoks), 0) = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_empty_docs,
        | CAST(sum(coalesce(len(ztoks), 0)) AS BIGINT) AS n_inner,
        | CAST(sum(greatest(coalesce(len(ztoks), 0), 1)) AS BIGINT)
        |   AS n_outer,
        | CAST(sum(CASE WHEN coalesce(len(ztoks), 0) = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_null_rows
        |FROM base GROUP BY lang ORDER BY lang""".stripMargin,
    // the cogroup is engine-side representation; the oracle restates the
    // per-key merge as a LEFT JOIN aggregate with q01's charge decimals
    "q232_cogroup_recon" ->
      """WITH o AS (
        | SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS oc
        | FROM orders WHERE o_orderkey % 23 = 0),
        |l AS (
        | SELECT l_orderkey,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,4))
        |   * CAST(1.0 - l_discount AS DECIMAL(12,4))
        |   * CAST(1.0 + l_tax AS DECIMAL(12,4)), 2) * 100 AS BIGINT) AS lc
        | FROM lineitem WHERE l_orderkey % 23 = 0)
        |SELECT o.o_orderkey,
        | o.oc AS order_total_c,
        | CAST(coalesce(sum(l.lc), 0) AS BIGINT) AS lines_total_c,
        | o.oc - CAST(coalesce(sum(l.lc), 0) AS BIGINT) AS delta_c,
        | CAST(count(l.lc) AS BIGINT) AS n_lines
        |FROM o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderkey, o.oc
        |ORDER BY o_orderkey""".stripMargin,
    // per-row scalar twins; regexes in the shared RE2 subset
    "q230_string_toolkit" ->
      """SELECT p_partkey, p_name,
        | split_part(p_name, ' ', 2) AS second_word,
        | translate(p_name, 'aeiou', '_____') AS devoweled,
        | array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|')
        |   AS words_csv,
        | CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
        | CAST(levenshtein(p_name, 'standard polished brass') AS INT)
        |   AS edit_dist,
        | lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
        | reverse(repeat(split_part(p_name, ' ', 1), 2)) AS doubled_rev
        |FROM part WHERE p_partkey % 13 = 0
        |ORDER BY p_partkey""".stripMargin,
    // day − dense_rank(day) is constant exactly on consecutive-day runs;
    // argmax by (len, earliest start) via the min-struct trick
    "q231_gaps_islands" ->
      """WITH days AS (
        | SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        | FROM events),
        |isl AS (
        | SELECT user_id, day,
        |  day - dense_rank() OVER (PARTITION BY user_id ORDER BY day)
        |    AS isl
        | FROM days),
        |runs AS (
        | SELECT user_id, isl, CAST(count(*) AS BIGINT) AS len,
        |  min(day) AS start_day
        | FROM isl GROUP BY 1, 2),
        |agg AS (
        | SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  max(struct_pack(len := len, ns := -start_day)) AS m
        | FROM runs GROUP BY 1)
        |SELECT user_id, n_active_days, n_islands,
        | m.len AS longest_streak, -(m.ns) AS longest_start_day
        |FROM agg ORDER BY user_id""".stripMargin,
    // weekday pinned Monday=0 (Spark weekday ≡ DuckDB isodow − 1); the
    // business-day count filters the same month-bounded date sequence
    "q226_calendar_math" ->
      """SELECT o_orderkey,
        | CAST(o_orderdate AS DATE) AS od,
        | last_day(CAST(o_orderdate AS DATE)) AS last_dom,
        | CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INT)
        |   AS days_in_month,
        | CAST(isodow(o_orderdate) - 1 AS INT) AS wd_mon0,
        | CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        | CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS DATE)
        |   AS next_month_start,
        | CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
        |   AS INT) AS months_since_anchor,
        | CAST(len(list_filter(
        |   generate_series(CAST(date_trunc('month', o_orderdate) AS DATE),
        |     last_day(CAST(o_orderdate AS DATE)), INTERVAL 1 DAY),
        |   x -> isodow(x) <= 5)) AS INT) AS biz_days_in_month
        |FROM orders WHERE o_orderkey % 17 = 0
        |ORDER BY o_orderkey""".stripMargin,
    // the map is engine-side representation; the oracle reproduces the
    // VALUES relationally (sorted keys ⇒ sorted string_agg)
    "q227_map_kv" ->
      """WITH e AS (
        | SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        | FROM events WHERE user_id % 11 = 0 GROUP BY 1, 2)
        |SELECT user_id,
        | CAST(count(*) AS INT) AS n_types,
        | string_agg(event_type, ',' ORDER BY event_type) AS types_csv,
        | CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN n END), 0)
        |   AS BIGINT) AS clicks,
        | CAST(sum(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS INT)
        |   AS n_heavy_types,
        | CAST(sum(n) * 2 AS BIGINT) AS double_total
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    // set algebra rebuilt relationally: INTERSECT/EXCEPT/UNION over the
    // distinct (user, parity, type) basis, positions via a sorted rank
    "q228_array_algebra" ->
      """WITH e AS (
        | SELECT DISTINCT user_id, event_type,
        |  (epoch_us(ts) // 86400000000) % 2 AS par
        | FROM events WHERE user_id % 13 = 0),
        |a AS (SELECT user_id, event_type FROM e WHERE par = 0),
        |b AS (SELECT user_id, event_type FROM e WHERE par = 1),
        |u AS (SELECT DISTINCT user_id FROM e),
        |acsv AS (SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS even_csv
        | FROM a GROUP BY 1),
        |bcsv AS (SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS odd_csv
        | FROM b GROUP BY 1),
        |bt AS (SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS both_csv
        | FROM (SELECT * FROM a INTERSECT SELECT * FROM b) GROUP BY 1),
        |oo AS (SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS odd_only_csv
        | FROM (SELECT * FROM b EXCEPT SELECT * FROM a) GROUP BY 1),
        |un AS (SELECT user_id, event_type FROM a
        |       UNION SELECT user_id, event_type FROM b),
        |ua AS (
        | SELECT user_id, CAST(count(*) AS INT) AS n_union,
        |  min(CASE WHEN event_type = 'click' THEN rnk END) AS click_pos
        | FROM (SELECT user_id, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY event_type) AS rnk
        |       FROM un) GROUP BY 1)
        |SELECT u.user_id,
        | coalesce(acsv.even_csv, '') AS even_csv,
        | coalesce(bcsv.odd_csv, '') AS odd_csv,
        | coalesce(bt.both_csv, '') AS both_csv,
        | coalesce(oo.odd_only_csv, '') AS odd_only_csv,
        | ua.n_union,
        | CAST(ua.click_pos AS BIGINT) AS click_pos,
        | (bt.both_csv IS NOT NULL) AS overlaps
        |FROM u
        |LEFT JOIN acsv USING (user_id) LEFT JOIN bcsv USING (user_id)
        |LEFT JOIN bt USING (user_id) LEFT JOIN oo USING (user_id)
        |JOIN ua USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q05_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(sqrt(l_extendedprice), 6) AS sqrt_price,
        | round(ln(l_extendedprice), 6) AS ln_price,
        | round(pow(l_discount, 2), 8) AS disc_sq,
        | CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        | greatest(l_tax, l_discount) AS max_rate
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q06_agg_basic" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         | count(*) AS n_orders,
         | ${sqlDsum("o_totalprice")} AS sum_price,
         | min(o_totalprice) AS min_price,
         | max(o_totalprice) AS max_price,
         | ${sqlDavg("o_totalprice")} AS avg_price
         |FROM orders GROUP BY o_orderstatus, o_orderpriority
         |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q07_agg_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q08_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q09_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q10_join_inner_agg" ->
      s"""SELECT o_custkey,
         | $sqlRevenue AS revenue,
         | count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderstatus = 'F'
         |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q11_join_star" ->
      s"""SELECT n_name,
         | $sqlRevenue AS revenue
         |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q12_join_left" ->
      """SELECT c_custkey, c_name,
        | count(o_orderkey) AS n_orders,
        | CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q13_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q14_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q15_topk" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q16_set_union" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
        |ORDER BY custkey""".stripMargin,
    "q17_set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY custkey""".stripMargin,
    // literally the same template text the engine runs over temp views
    "q213_not_in_nulls" -> q213SqlFor("orders", "customer"),
    "q218_grouping_flags" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        | coalesce(l_linestatus, 'ALL') AS lstatus,
        | CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
        |   AS gid,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rflag, lstatus""".stripMargin,
    "q211_set_ops_all" ->
      """WITH a AS (SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity >= 45),
        |b AS (SELECT l_orderkey AS okey FROM lineitem WHERE l_discount >= 0.08),
        |ia AS (SELECT okey FROM a INTERSECT ALL SELECT okey FROM b),
        |ea AS (SELECT okey FROM a EXCEPT ALL SELECT okey FROM b)
        |SELECT 'intersect_all' AS op, okey, CAST(count(*) AS BIGINT) AS m
        |FROM ia GROUP BY okey
        |UNION ALL
        |SELECT 'except_all' AS op, okey, CAST(count(*) AS BIGINT) AS m
        |FROM ea GROUP BY okey
        |ORDER BY op, okey""".stripMargin,
    "q18_set_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY custkey""".stripMargin,
    "q19_window_rank" ->
      """SELECT user_id, event_id, value, CAST(rnk AS INT) AS rnk FROM (
        | SELECT user_id, event_id, value,
        |  rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
        | FROM events) WHERE rnk <= 5
        |ORDER BY user_id, rnk, event_id""".stripMargin,
    "q20_window_lag" ->
      """SELECT event_id, user_id, value, prev_value,
        | round(value - prev_value, 2) AS delta
        |FROM (
        | SELECT event_id, user_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        | FROM events)
        |ORDER BY event_id""".stripMargin,
    "q21_window_running" ->
      """SELECT event_id, user_id,
        | CAST(row_number() OVER w AS INT) AS seq,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q57_window_range" ->
      """SELECT event_id, user_id,
        | count(*) OVER w AS n_10min,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_10min
        |FROM (SELECT event_id, user_id, value, epoch_us(ts) AS tus FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // unique ORDER BY keys make every rank/navigation pick identical rows
    // in both engines; IGNORE NULLS spelled natively on each side
    "q220_window_extras" ->
      """WITH o AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate
        | FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_orderkey, o_orderstatus,
        | CAST(ntile(4) OVER wr AS INT) AS price_quartile,
        | percent_rank() OVER wr AS pr,
        | cume_dist() OVER wr AS cd,
        | nth_value(o_orderkey, 2) OVER wf AS second_cheapest_key,
        | first_value(o_orderkey) OVER wf AS cheapest_key,
        | lag(CASE WHEN o_totalprice > 250000.0 THEN o_orderkey END
        |     IGNORE NULLS) OVER wc AS prev_big_key
        |FROM o
        |WINDOW
        | wr AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
        | wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        | wc AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q58_conditionals" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |      WHEN c_acctbal < 5000 THEN 'standard'
        |      ELSE 'premium' END AS tier,
        | coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment,
        | least(c_acctbal, 9000.0) AS capped_bal,
        | greatest(c_acctbal, 0.0) AS floored_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // q22 and q54 are the same query through two executors (window vs
    // custom operator) — ONE oracle string, used twice, so they can't drift
    "q54_topk_group_native" -> topNPerGroupOracle,
    "q22_window_topn_group" -> topNPerGroupOracle,
    "q23_events_hourly" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
         | event_type, count(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "q94_rank_features" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | CAST(ntile(10) OVER w AS INT) AS decile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin,
    // hop starts are epoch-aligned integer-µs arithmetic: window k of an
    // event at tus starts at (tus//slide - k)*slide, k < size/slide
    "q86_hopping_window" ->
      s"""SELECT make_timestamp(((epoch_us(ts) // 900000000) - g.k) * 900000000)
         |  AS win_start,
         | event_type, count(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM events CROSS JOIN generate_series(0, 3) AS g(k)
         |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q24_events_json" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(k) AS BIGINT) AS sum_k,
        | max(k) AS max_k
        |FROM (SELECT event_type,
        |  CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q25_asof_join" ->
      """SELECT a.event_id, a.user_id,
        | b.event_id AS purchase_event_id, b.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        | ON a.user_id = b.user_id AND a.ts >= b.ts
        |ORDER BY a.event_id""".stripMargin,
    "q26_range_band_join" ->
      """WITH bands(band_id, band_name, lo, hi) AS (VALUES
        | (0, 'b0', 0.0, 100000.0),
        | (1, 'b1', 100000.0, 200000.0),
        | (2, 'b2', 200000.0, 300000.0),
        | (3, 'b3', 300000.0, 400000.0),
        | (4, 'b4', 400000.0, 1000000000.0))
        |SELECT band_id, band_name, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band_id, band_name ORDER BY band_id""".stripMargin,
    "q27_grouping_sets" -> q27SqlFor("orders"),
    "q59_min_cost_supplier" ->
      """WITH costs AS (
        | SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
        | FROM lineitem GROUP BY l_partkey, l_suppkey),
        |eligible AS (
        | SELECT c.l_partkey, c.l_suppkey, c.min_price, s.s_name, n.n_name
        | FROM costs c
        | JOIN supplier s ON c.l_suppkey = s.s_suppkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | WHERE r.r_name = 'EUROPE'),
        |ranked AS (
        | SELECT *, row_number() OVER (PARTITION BY l_partkey
        |   ORDER BY min_price, l_suppkey) AS rk
        | FROM eligible)
        |SELECT p.p_partkey, p.p_name, e.s_name, e.n_name AS supp_nation, e.min_price
        |FROM ranked e JOIN part p ON e.l_partkey = p.p_partkey
        |WHERE e.rk = 1 AND p.p_size <= 15 AND p.p_type = 'ECONOMY'
        |ORDER BY p_partkey""".stripMargin,
    "q28_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS tus FROM events),
        |g AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |      FROM (SELECT *, lag(tus) OVER
        |        (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e)),
        |s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |        ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |      FROM g)
        |SELECT user_id, session_seq, make_timestamp(min(tus)) AS session_start,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    // the IDENTICAL SQL text both engines run (q27's one-template
    // discipline) — DuckDB executes the correlated subqueries its own
    // way; parity is in the integer-exact threshold arithmetic
    "q189_correlated_subquery" -> q189SqlFor("lineitem", "part", "orders"),
    "q194_recursive_cte" -> q194SqlFor("orders"),
    "q198_lateral_join" -> q198SqlFor("region", "nation", "customer"),
    // the oracle re-parses the IDENTICAL constructed text with DuckDB's
    // JSON functions — construction uses only engine-identical renderings
    "q201_variant_json" ->
      """WITH j AS (
        | SELECT event_type,
        |  '{"meta":{"t":"' || event_type || '","k":' ||
        |   coalesce(CAST(CASE WHEN json_valid(props)
        |     THEN json_extract(props, '$.k') END AS VARCHAR), 'null') ||
        |   '},"cents":' ||
        |   CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)
        |   || '}' AS jtxt
        | FROM events),
        |x AS (
        | SELECT json_extract_string(jtxt, '$.meta.t') AS t,
        |  CAST(json_extract(jtxt, '$.meta.k') AS INTEGER) AS k,
        |  CAST(json_extract(jtxt, '$.cents') AS BIGINT) AS vcents
        | FROM j)
        |SELECT t, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        | CAST(sum(vcents) AS BIGINT) / 100.0 AS sum_value
        |FROM x GROUP BY t ORDER BY t""".stripMargin,
    // DuckDB has no XML functions: the construction is lossless, so the
    // oracle aggregates the base columns — roundtrip-is-identity is the
    // property under test on the Spark side
    "q203_xml_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        | CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |   AS BIGINT) / 100.0 AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
}
