package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.slf4j.LoggerFactory
import graft.Tables

/** Incremental-ingestion operators — the ETL surface a production pipeline
  * layers on top of the reference's one-shot snapshot load
  * (`/root/reference/src/main.rs:27-80` runs cold-path-or-skip; it has no
  * notion of applying a delta to an existing table). Two operators:
  *
  *  - CDC MERGE/upsert ([[q73MergeUpsert]]): apply an aggregated change set
  *    onto a base snapshot — the standard warehouse upsert, expressed as a
  *    single full-outer shuffle join on the key.
  *  - Bloom-prefiltered join ([[q75BloomJoin]]): the semi-join-reduction
  *    pattern for joins whose build side is selective — ship a compact
  *    filter to the probe side so non-matching rows die at the scan instead
  *    of crossing the shuffle.
  */
object EtlOps {

  private val log = LoggerFactory.getLogger(getClass)

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  // the one timestamp convention, shared with Relational
  private def ntz(c: Column): Column = Relational.ntz(c)
  private def tsLit(s: String): Column = Relational.tsLit(s)
  private val dec = DecimalType(18, 2)

  // ---------------------------------------------------------------- q73
  /** The base snapshot: customers below key 1200, balances pinned to
    * DECIMAL(18,2). State schema from here on:
    * (custkey, acctbal, in_base, delta_bal, n_orders) — acctbal/in_base
    * null for keys first seen in a delta, delta_bal/n_orders null until a
    * delta touches the key. */
  def mergeBaseState(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") < 1200)
      .select(col("c_custkey").as("custkey"),
        col("c_acctbal").cast(dec).as("acctbal"),
        lit(1).as("in_base"),
        lit(null).cast(DecimalType(28, 2)).as("delta_bal"),
        lit(null).cast("long").as("n_orders"))

  /** Pre-aggregate an orders change set to one row per key (the MERGE
    * contract): summed totals + order counts since the cutoff. */
  def deltaAgg(orders: DataFrame): DataFrame =
    orders
      .filter(ntz(col("o_orderdate")) >= tsLit("2000-01-01T00:00:00"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast(dec)).as("d_bal"),
        count(lit(1)).as("d_n"))

  /** One merge round: full-outer join state with an aggregated delta and
    * fold the delta into the accumulators. ASSOCIATIVE in the delta —
    * folding deltas one batch at a time lands on the same state as one
    * fold of their union (sums and counts add; base markers carry) —
    * which is exactly what lets the streaming foreachBatch apply
    * ([[graft.streaming.IngestStream.q79StreamMerge]]) share this code
    * path and q73's oracle. */
  def mergeState(state: DataFrame, delta: DataFrame): DataFrame =
    state.join(delta, Seq("custkey"), "full_outer")
      .select(
        col("custkey"),
        col("acctbal"),
        col("in_base"),
        // pin the accumulator type so repeated merge rounds don't walk the
        // decimal precision up to the 38 cap
        when(col("d_bal").isNotNull || col("delta_bal").isNotNull,
          coalesce(col("delta_bal"), lit(0).cast(dec)) +
            coalesce(col("d_bal"), lit(0).cast(dec)))
          .cast(DecimalType(28, 2)).as("delta_bal"),
        when(col("d_n").isNotNull || col("n_orders").isNotNull,
          coalesce(col("n_orders"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"))

  /** Final presentation of the merged state: the update/insert/keep action
    * split and double-cast balances. */
  def presentMerge(state: DataFrame): DataFrame =
    state.select(
      col("custkey"),
      when(col("in_base").isNotNull && col("delta_bal").isNotNull, "update")
        .when(col("in_base").isNull, "insert")
        .otherwise("keep").as("action"),
      coalesce(col("acctbal"), lit(0).cast(dec)).cast("double").as("old_bal"),
      (coalesce(col("acctbal"), lit(0).cast(dec)) +
        coalesce(col("delta_bal"), lit(0).cast(dec))).cast("double").as("new_bal"),
      coalesce(col("n_orders"), lit(0L)).as("n_orders"))

  /** CDC MERGE / upsert: apply a change set onto a base snapshot in one
    * pass — the incremental sibling of the reference's full-snapshot load.
    * Base = the customer snapshot taken before key 1200 existed; delta =
    * per-customer order totals since the cutoff, pre-aggregated to one row
    * per key (the MERGE contract). The merge itself is a full-outer join
    * on the key producing the classic three-way action split:
    * `update` (both sides), `insert` (delta only), `keep` (base only).
    *
    * Scale: one shuffle on the key for the delta aggregation (partial
    * map-side combine first) and one for the join; AQE handles a skewed
    * key. Base-side presence is an explicit marker column and delta-side
    * presence is the accumulator's null state — a null acctbal in the
    * base must not reclassify the row. Money math in DECIMAL(18,2), cast
    * once at the end, so the merged balances are exact. */
  def q73MergeUpsert(s: SparkSession, d: String): DataFrame =
    presentMerge(mergeState(mergeBaseState(t(s, d, "customer")),
      deltaAgg(t(s, d, "orders"))))
      .orderBy("custkey")

  // ---------------------------------------------------------------- q75
  /** Bloom-prefiltered join — semi-join reduction for a selective build
    * side: build a Bloom filter over the filtered dim keys (one aggregate;
    * the sketch is KB-sized and driver-bounded exactly like the IVF
    * centroids in [[SimilarityOps]]), broadcast it, and drop probe-side
    * rows whose key cannot be present BEFORE the join shuffle. False
    * positives survive the prefilter and are removed by the real join;
    * Bloom filters have no false negatives — so the result is EXACTLY the
    * plain join's, which is why this query keeps a DuckDB oracle that
    * never mentions the filter.
    *
    * At 100 TB this is the difference between shuffling the whole fact
    * table and shuffling the ~matching fraction: with a 1% fpp, a probe row
    * crosses the exchange only if it (almost certainly) joins. Spark's AQE
    * injects the same shape automatically for some plans
    * (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is
    * the explicit, always-on form, sized by default from an exact count of
    * the build side (one extra cheap aggregate over the side the sketch
    * scans anyway — an undersized filter saturates to fpp ~ 1 and silently
    * stops filtering). The bit array is CAPPED at 256 MB: the optimal
    * size grows ~9.6 bits/key at 1% fpp, so a 3e10-key build side would
    * otherwise ask every aggregation task to allocate a ~36 GB array and
    * then broadcast it (df.stat.bloomFilter builds one per task and
    * merges). Past the cap the filter keeps its size and lets fpp rise
    * instead — MORE probe rows survive to the real join (degraded
    * effectiveness, logged), but never a wrong result: false negatives
    * remain impossible at any fpp. The membership probe is a
    * broadcast-local UDF call per row — cheap relative to the exchange
    * bytes it saves, though (unlike a fused native expression) not
    * codegen-inlined. */
  def bloomSemiFilter(probe: DataFrame, probeKey: String,
                      build: DataFrame, buildKey: String,
                      expectedItems: Option[Long] = None,
                      fpp: Double = 0.01): DataFrame = {
    // size from the build side itself unless the caller knows better — a
    // hardcoded capacity silently saturates at scale (fpp -> 1) and the
    // prefilter stops filtering while still charging for the probe
    val items = expectedItems.getOrElse(build.count())
    // an EMPTY build side can match nothing — and Spark's stat.bloomFilter
    // on zero rows returns an unmerged sketch whose bit buffer is null
    // (NPE at broadcast serialization), so short-circuit before building.
    // The expectedItems path must check ACTUAL emptiness too (a caller's
    // nonzero estimate over an empty table would still hit the NPE);
    // isEmpty is a limit-1 probe, cheap at any scale
    if (items == 0L || (expectedItems.isDefined && build.isEmpty))
      return probe.filter(lit(false))
    val optimalBits =
      math.ceil(-items.toDouble * math.log(fpp) / (math.log(2) * math.log(2)))
    val maxBits = 1L << 31 // 256 MB of bits — executor- and broadcast-safe
    val bf =
      if (optimalBits <= maxBits.toDouble)
        build.stat.bloomFilter(buildKey, items, fpp)
      else {
        log.warn(s"bloomSemiFilter: $items build keys want " +
          f"${optimalBits / 8 / 1048576}%.0f MB of bits; capping at 256 MB " +
          "(fpp rises, result unchanged — the real join removes survivors)")
        build.stat.bloomFilter(buildKey, items, maxBits)
      }
    val bcast = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bcast.value.mightContain(k))
    probe.filter(might(col(probeKey)))
  }

  def q75BloomJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
    val li = bloomSemiFilter(t(s, d, "lineitem"), "l_orderkey",
      urgent, "o_orderkey")
    li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        Relational.dsum(col("l_quantity")).as("sum_qty"),
        Relational.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- q80
  /** Latest-event-per-key — the CDC dedupe that precedes any merge apply
    * (collapse an at-least-once change feed to one current row per key).
    * Formulated as max(struct(ts, id, payload)) — ONE aggregation with
    * full map-side partial combine, which at 100 TB beats the equivalent
    * row_number window (that shape must shuffle and sort EVERY event; the
    * aggregate shuffles one candidate row per key per input partition).
    * The struct comparison is lexicographic, so (tus, event_id) makes the
    * winner deterministic under same-microsecond ties — both engines
    * compare field-by-field, which is what keeps the oracle exact. */
  def q80LatestPerKey(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("user_id"),
        struct(expr("ts div 1000").as("tus"), col("event_id"),
          col("event_type"), col("value")).as("ev"))
      .groupBy("user_id")
      .agg(max(col("ev")).as("le"))
      .select(col("user_id"),
        col("le.event_id").as("last_event_id"),
        col("le.event_type").as("last_type"),
        col("le.value").as("last_value"),
        col("le.tus").as("last_tus"))
      .orderBy("user_id")

  // ---------------------------------------------------------------- q81
  /** Sequential FUNNEL analysis — ordered-stage conversion over the event
    * stream (signup → first click at-or-after it → first purchase
    * at-or-after that), the product-analytics operator sessionization
    * does not cover because stages must happen in ORDER. Three per-user
    * conditional min-aggregations chained by key joins — every stage is
    * one (partial-combined) groupBy on user_id plus a narrow join of
    * per-user stage times; nothing resembling a per-user sort or event
    * collection exists, so the plan is flat aggregations at any scale.
    * Time math stays in integer microseconds until the final single
    * division per output cell (IEEE ops on exact integers — engine-
    * deterministic), so the one-row report keeps an exact oracle. */
  def q81EventFunnel(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tus").as("t_s"))
    val cl = e.filter(col("event_type") === "click")
      .join(su, "user_id").filter(col("tus") >= col("t_s"))
      .groupBy("user_id").agg(min("tus").as("t_c"), min("t_s").as("t_s2"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(cl.select("user_id", "t_c"), "user_id").filter(col("tus") >= col("t_c"))
      .groupBy("user_id").agg(min("tus").as("t_p"), min("t_c").as("t_c2"))
    val hours = 3600.0 * 1000 * 1000
    // latencies stay UNROUNDED doubles: integer sums cast exactly, and the
    // two IEEE divisions are deterministic in both engines — a final
    // round(double) is the one step that can diverge cross-engine
    // one-row sides compose via broadcast cross joins — no driver collect
    e.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(broadcast(su.agg(count(lit(1)).as("n_signup"))))
      .crossJoin(broadcast(
        cl.agg(count(lit(1)).as("n_click"),
          ((sum(col("t_c") - col("t_s2")).cast("double") / count(lit(1))) / hours)
            .as("avg_h_signup_to_click"))))
      .crossJoin(broadcast(
        pu.agg(count(lit(1)).as("n_purchase"),
          ((sum(col("t_p") - col("t_c2")).cast("double") / count(lit(1))) / hours)
            .as("avg_h_click_to_purchase"))))
      .select(col("n_users"), col("n_signup"), col("n_click"),
        col("n_purchase"), col("avg_h_signup_to_click"), col("avg_h_click_to_purchase"))
  }

  // ---------------------------------------------------------------- q82
  /** RETENTION cohort grid — users cohorted by their first-activity week,
    * activity counted per (cohort_week, week_offset) cell: the standard
    * engagement matrix. Weeks are PURE INTEGER math on epoch microseconds
    * (us div day div 7 — no calendar functions, so no engine drift and no
    * timezone surface). Two shuffles total: the per-user first-week
    * aggregation and the cell rollup; the user→cohort attach is a narrow
    * key join. count(DISTINCT user) per cell is exact (Spark expands it
    * to a two-level aggregate — still partial-combined on the first
    * level). */
  def q82RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000 div 7").as("week"))
    val cohort = e.groupBy("user_id").agg(min("week").as("cohort_week"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  // ------------------------------------------------------------------------
  // ---------------------------------------------------------------- q93
  /** SCD TYPE-2 HISTORY build — turn a change feed into versioned validity
    * intervals, the warehouse-dimension sibling of the CDC merge (q73
    * keeps only current state; this keeps every version): each order is a
    * version of its customer's purchasing state, valid from its own date
    * until the next order's date (`lead`), the last version open-ended
    * and flagged current. One window per key — a single shuffle on
    * custkey and a streaming per-key sort, the same shape at any scale;
    * (date, orderkey) ordering makes same-day versions deterministic.
    * All values pass through untouched (timestamps and the raw double),
    * so the oracle is exact by construction. */
  def q93Scd2History(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("custkey").orderBy("valid_from", "order_key")
    t(s, d, "orders")
      .filter(col("o_custkey") % 20 === 1)
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("order_key"),
        ntz(col("o_orderdate")).as("valid_from"),
        col("o_totalprice").as("totalprice"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("custkey", "version")
  }

  // ---------------------------------------------------------------- q95
  /** Time-grid RESAMPLE + LOCF gap-fill — the time-series regularization
    * step (per-entity hourly grid, missing hours zero-counted, state
    * carried forward from the last observation): each user's event stream
    * becomes a dense hourly series from their first to their last active
    * hour. Three shuffle-once-on-user_id stages: (1) per-(user, hour)
    * rollup keeping the LATEST event value via the q80 max-struct trick
    * (full map-side combine, deterministic (tus, event_id) tiebreak);
    * (2) the grid generated map-side from each user's [first, last] hour
    * span (`sequence` + explode — the generator fan-out shape again);
    * (3) forward fill as `last(value, ignoreNulls) over rows unbounded
    * preceding` — a streaming frame, O(1) state per row. Hour ids stay
    * integer hours-since-epoch end to end; the carried value is a raw
    * passthrough double — nothing to round, oracle exact. */
  def q95ResampleFfill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, d, "events").filter(col("user_id") < 8)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("value"))
      .withColumn("hour_id", expr("tus div 3600000000"))
    val hourly = e.groupBy("user_id", "hour_id")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("tus"), col("event_id"), col("value"))).as("le"))
      .select(col("user_id"), col("hour_id"), col("n_events"),
        col("le.value").as("last_in_hour"))
    val grid = e.groupBy("user_id")
      .agg(min("hour_id").as("h0"), max("hour_id").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour_id"))
    val w = Window.partitionBy("user_id").orderBy("hour_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour_id"), "left")
      .select(col("user_id"), col("hour_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("last_in_hour"),
        last(col("last_in_hour"), ignoreNulls = true).over(w).as("value_locf"))
      .orderBy("user_id", "hour_id")
  }

  // ---------------------------------------------------------------- q123
  /** Time-grid resample with LINEAR INTERPOLATION — the smoothing sibling
    * of q95's LOCF: a missing hour takes the line between the last
    * observation before it and the first one after it, the fill a metric
    * dashboard or feature pipeline wants for continuous signals (LOCF
    * staircases them). Same three shuffle-once-on-user stages as q95
    * (per-hour latest via max-struct, map-side grid generator, window
    * pass); the interpolation needs BOTH directions, so two streaming
    * frames run over the grid — prev = last non-null observation before,
    * next = first after — each O(1) state per row.
    *
    * Exactness: values quantize to cents, hours are integers, and the
    * interpolated value vp + (vn−vp)·(h−hp)/(hn−hp) evaluates entirely in
    * LONG arithmetic with one micro-cent integer division. Both engines
    * TRUNCATE integer division toward zero (Spark `div`, DuckDB `//` —
    * measured, not assumed: -7//2 = -3 in DuckDB), so negative slopes
    * quantize identically with no adjustment. Interior grid hours always
    * have both neighbors (the span runs first→last observation), so the
    * denominator is never zero on unobserved rows. */
  def q123LinearGapfill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, d, "events").filter(col("user_id") < 8)
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"),
        graft.streaming.EventsStream.cents(col("value")).as("vc"))
      .withColumn("hour_id", expr("tus div 3600000000"))
    val hourly = e.groupBy("user_id", "hour_id")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("tus"), col("event_id"), col("vc"))).as("le"))
      .select(col("user_id"), col("hour_id"), col("n_events"),
        col("le.vc").as("vc"))
    val grid = e.groupBy("user_id")
      .agg(min("hour_id").as("h0"), max("hour_id").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour_id"))
    val wPrev = Window.partitionBy("user_id").orderBy("hour_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("hour_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(hourly, Seq("user_id", "hour_id"), "left")
      .withColumn("obs", when(col("vc").isNotNull,
        struct(col("hour_id").as("h"), col("vc").as("v"))))
      .withColumn("prev", last(col("obs"), ignoreNulls = true).over(wPrev))
      .withColumn("next", first(col("obs"), ignoreNulls = true).over(wNext))
      .withColumn("value_u", {
        // micro-unit grid in DECIMAL(38,0): cents are bounded only by the
        // DECIMAL(18,2) cap (~1e16), so cents·1e6 overflows a raw long —
        // widen before multiplying (oracle: HUGEINT), and divide with the
        // decimal trunc-div (Spark `div` returns LONG and would overflow
        // on the quotient; DuckDB `//` truncates identically)
        import org.apache.spark.sql.types.DecimalType
        val dec38 = DecimalType(38, 0)
        when(col("vc").isNotNull, col("vc").cast(dec38) * 1000000L)
          .otherwise(col("prev.v").cast(dec38) * 1000000L +
            Tables.decTruncDiv(
              (col("next.v") - col("prev.v")).cast(dec38)
                * (col("hour_id") - col("prev.h")) * 1000000L,
              (col("next.h") - col("prev.h")).cast(dec38)))
      })
      .select(col("user_id"), col("hour_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("vc").isNotNull.as("is_observed"),
        (col("value_u").cast("double") / 100000000.0).as("value_interp"))
      .orderBy("user_id", "hour_id")
  }

  // ---------------------------------------------------------------- q98
  /** Interval-concurrency SWEEP LINE — "how many order lines were in
    * fulfillment on each day": every (order date, ship date) interval
    * contributes +1 at its start and -1 at its end, and the running sum of
    * the per-day net delta is the live concurrency. The classic peak-load /
    * active-sessions operator, shaped for scale:
    *
    *  - the interval build is one fact-fact shuffle join on the order key
    *    (lineitem ⋈ orders, both sides key-partitioned, AQE-coalesced);
    *  - each interval emits its ±1 deltas map-side (a 2-element generator,
    *    no second scan for the end points) and they partially aggregate
    *    into per-day nets BEFORE the shuffle — the shuffle carries at most
    *    one row per (partition, day);
    *  - only the per-day frame crosses the final single-partition window,
    *    and that frame is bounded by the CALENDAR domain (~2.5k days here,
    *    ~37k days for a century), not by the data volume: the sweep stays
    *    a few-KiB window no matter how many billion intervals feed it.
    *
    * Zero-length intervals (shipped same day) are excluded up front —
    * they cancel to net 0 and would only add noise days. All-integer
    * arithmetic → exact oracle. */
  def q98OpenIntervals(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(ntz(col("l_shipdate")) > ntz(col("o_orderdate")))
      .select(ntz(col("o_orderdate")).as("start_day"),
        ntz(col("l_shipdate")).as("end_day"))
    val byDay = iv
      .select(explode(array(
        struct(col("start_day").as("day"), lit(1L).as("dd")),
        struct(col("end_day").as("day"), lit(-1L).as("dd")))).as("x"))
      .groupBy(col("x.day").as("day")).agg(sum(col("x.dd")).as("net"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay.withColumn("open_cnt", sum(col("net")).over(w)).orderBy("day")
  }

  // ---------------------------------------------------------------- q142
  /** ROLLING 7-DAY ACTIVE USERS (DAU/WAU) — sliding-window DISTINCT
    * count, the product-analytics metric that defeats ordinary window
    * frames (distinct doesn't decompose over a moving frame) and whose
    * naive plans are scale traps: per-day range self-joins fan every
    * event out 7×, and per-window re-distincting is quadratic in window
    * overlap. The linear shape: a user's presence on day p makes them
    * "active" on days [p, p+6], so per user, merge overlapping coverage
    * intervals (the q28 gap-sessionize pattern at gap 6), then sweep-line
    * the merged intervals — +1 at start, -1 past end — and one running
    * sum over the CALENDAR domain (q98's discipline: the only
    * single-partition window runs over days, which are bounded by the
    * data's span, not its volume) yields the distinct-active count for
    * every day. Each user contributes ±1 per merged interval, not per
    * event: cost is one (user, day) distinct + one per-user window +
    * one calendar-keyed aggregate, all linear at 100 TB.
    *
    * Day-0 deltas carry the observed data days through the same
    * aggregate, so the report emits exactly the days that have events
    * (with dau riding along) — and every count is an integer, so the
    * brute-force range-join DuckDB oracle matches exactly. */
  def q142RollingActives(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = t(s, d, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val dau = p.groupBy("day").agg(count(lit(1)).as("dau"))
    val wUser = Window.partitionBy("user_id").orderBy("day")
    val iv = p
      .withColumn("prev", lag(col("day"), 1).over(wUser))
      .withColumn("brk",
        when(col("prev").isNull || col("day") > col("prev") + 6, 1L).otherwise(0L))
      .withColumn("iv", sum(col("brk")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "iv")
      .agg(min(col("day")).as("s"), (max(col("day")) + 6).as("e"))
    val deltas = iv.select(explode(array(
        struct(col("s").as("day"), lit(1L).as("dd")),
        struct((col("e") + 1).as("day"), lit(-1L).as("dd")))).as("x"))
      .select(col("x.day").as("day"), col("x.dd").as("dd"))
      .union(dau.select(col("day"), lit(0L).as("dd")))
      .groupBy("day").agg(sum(col("dd")).as("net"))
    val wDay = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("wau7", sum(col("net")).over(wDay))
      .join(dau, "day")
      .select(col("day"), col("dau"), col("wau7"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q106
  /** SNAPSHOT DIFF — derive the changeset BETWEEN two table versions (the
    * inverse of the q73 MERGE: q73 applies a delta, this recovers one):
    * full-outer join on the key, classify insert / delete / update by
    * side-presence and value inequality, drop unchanged rows. This is the
    * reconciliation primitive for snapshot-shipping pipelines (no CDC
    * feed, just yesterday's and today's 100 TB extracts) — and the
    * row-level drill-down a mismatched q97 checksum bucket triggers: at
    * scale you'd diff only `pmod(key, 64) = damaged_bucket`, which this
    * plan supports by pushing that predicate to both scans.
    *
    * The two demo versions are deterministic slices of `orders` (v0 drops
    * key%7=0 as not-yet-arrived; v1 drops key%11=0 as purged and
    * reprices urgent orders +1.00): inserts, deletes and updates all
    * occur by construction at every SF. DECIMAL(18,2) prices passthrough
    * untouched — exact oracle. One key-shuffle join, AQE-coalesced;
    * unchanged rows (the overwhelming mass at scale) die in the
    * post-join filter without ever being carried further. */
  def q106SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "orders").select(col("o_orderkey").as("okey"),
      col("o_totalprice").cast(dec).as("price"), col("o_orderpriority"))
    val v0 = base.filter(col("okey") % 7 =!= 0)
      .select(col("okey"), col("price").as("old_price"))
    val v1 = base.filter(col("okey") % 11 =!= 0)
      .select(col("okey"),
        when(col("o_orderpriority") === "1-URGENT",
          (col("price") + lit(BigDecimal("1.00")).cast(dec)).cast(dec))
          .otherwise(col("price")).as("new_price"))
    v0.join(v1, Seq("okey"), "full_outer")
      .withColumn("change_type",
        when(col("old_price").isNull, "insert")
          .when(col("new_price").isNull, "delete")
          .when(col("old_price") =!= col("new_price"), "update"))
      .filter(col("change_type").isNotNull)
      .select(col("okey"), col("change_type"), col("old_price"), col("new_price"))
      .orderBy("okey")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q107
  /** Event TRANSITION MATRIX — within-session Markov counts: for adjacent
    * event pairs of the same user separated by at most the session gap
    * (q28's 30-minute contract), count each (from, to) event-type
    * transition and its conditional probability P(to | from). The
    * path-analysis / next-action primitive behind sankey funnels and
    * behavioral anomaly detection.
    *
    * One shuffle on user_id for the lag window (state per row is O(1)),
    * then a map-side-combinable count on the 5×5 type grid; the
    * conditional probability is a per-row integer→double division
    * against the broadcast per-from totals. Integer microsecond
    * timestamps end to end — exact oracle. */
  def q107EventTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800000000L
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val steps = t(s, d, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("tus"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_tus", lag(col("tus"), 1).over(w))
      .filter(col("prev_type").isNotNull &&
        col("tus") - col("prev_tus") <= gapUs)
    val cnt = steps.groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = cnt.groupBy("from_type").agg(sum("n").as("from_n"))
    cnt.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("from_n").cast("double")).as("p"))
      .orderBy("from_type", "to_type")
  }

  // ---------------------------------------------------------------- q180
  /** Candidate functional dependencies for the FD audit — (table, lhs,
    * rhs) meaning "lhs should determine rhs". Mixed on purpose: some hold
    * by construction (the schema's implicit contracts), some are expected
    * to fail (real profiling output distinguishes the two). */
  private[ops] val fdCandidates: Seq[(String, String, String)] = Seq(
    ("nation", "n_nationkey", "n_regionkey"),
    ("part", "p_name", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("documents", "source", "lang"))

  /** FUNCTIONAL-DEPENDENCY AUDIT — candidate-FD checking, the profiling
    * pass behind schema discovery and data-contract enforcement (the
    * verification half of FD-discovery systems; candidate GENERATION is a
    * search problem out of scope for one query). For each candidate
    * lhs→rhs: how many lhs groups exist, how many witness ≥2 distinct rhs
    * values (violating groups), how many rows sit inside violating groups
    * (the blast radius a cleanup job would touch), and the worst group's
    * distinct-rhs count.
    *
    * Shape: per candidate ONE lhs-keyed aggregate with a two-phase exact
    * distinct (partial per-partition distinct before the exchange — no
    * row-level distinct shuffle), then a one-row rollup; the union is
    * candidate-count rows. Each candidate's scan prunes to exactly two
    * columns. Violating-group row counts use a conditional sum in the
    * same pass — no second scan, no join-back. */
  def q180FdAudit(s: SparkSession, d: String): DataFrame = {
    val audits = fdCandidates.map { case (tbl, lhs, rhs) =>
      t(s, d, tbl)
        .groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("ndv"), count(lit(1)).as("nrows"))
        .agg(
          lit(s"$tbl.$lhs->$rhs").as("fd"),
          count(lit(1)).as("n_groups"),
          sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("n_violating"),
          sum(when(col("ndv") > 1, col("nrows")).otherwise(0L))
            .as("violating_rows"),
          max(col("ndv")).as("max_ndv"))
    }
    audits.reduce(_.unionAll(_))
      .withColumn("holds", col("n_violating") === 0L)
      .orderBy("fd")
  }

  // ---------------------------------------------------------------- q114
  /** DATA-QUALITY / INTEGRITY audit — the constraint suite a pipeline runs
    * before promoting a snapshot (the reference's verifier,
    * /root/reference/src/main.rs:102-150, checks column NAMES only; this is
    * the row-level counterpart): referential integrity across the star
    * schema, key uniqueness, and domain checks, one result row per check so
    * a gate can alert on any n_violations > 0.
    *
    *  - lineitem_orphan_orderkey / orders_orphan_custkey: child keys with
    *    no parent row — LEFT ANTI joins carrying only the key column, so
    *    the shuffle is (key) pairs, never payloads. At 100 TB both sides
    *    hash-partition on the key; no broadcast assumption on the parent.
    *  - events_dup_event_id: n_total − n_distinct over the id column (one
    *    partial-aggregated scan, no self-join).
    *  - events_nonpositive_value / documents_blank_text: conditional
    *    counts, map-side only.
    *
    * Each check is a one-row aggregate; the union of five one-row frames is
    * driver-trivial. violation_rate is one IEEE division of exact longs. */
  def q114IntegrityAudit(s: SparkSession, d: String): DataFrame = {
    // each check yields a one-row (n_total, n_violations) frame
    // try_divide: ANSI `/` throws DIVIDE_BY_ZERO (doubles included) on an
    // empty table's 0/0 rate; DuckDB's `/` yields NULL there — try_divide
    // is the matching Spark spelling, a no-op on any non-empty table
    def shape(name: String, counts: DataFrame): DataFrame =
      counts.select(lit(name).as("check_name"),
        col("n_total"), col("n_violations"),
        try_divide(col("n_violations").cast("double"),
          col("n_total").cast("double")).as("violation_rate"))
    val li = t(s, d, "lineitem").select(col("l_orderkey"))
    val ord = t(s, d, "orders")
    val ev = t(s, d, "events")
    val liOrphans = li
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val ordOrphans = ord.select(col("o_custkey"))
      .join(t(s, d, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    // both events checks ride ONE scan: a 100 TB table should not be read
    // twice by its own integrity gate
    val evChecks = ev.agg(count(lit(1)).as("n_total"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("dup"),
        count(when(col("value") <= 0, 1)).as("nonpos"))
      .select(col("n_total"), expr(
        "stack(2, '3_events_dup_event_id', dup, " +
          "'4_events_nonpositive_value', nonpos) AS (check_name, n_violations)"))
      .select(col("check_name"), col("n_total"), col("n_violations"),
        try_divide(col("n_violations").cast("double"),
          col("n_total").cast("double")).as("violation_rate"))
    shape("1_lineitem_orphan_orderkey",
        li.agg(count(lit(1)).as("n_total")).crossJoin(liOrphans))
      .unionByName(shape("2_orders_orphan_custkey",
        ord.agg(count(lit(1)).as("n_total")).crossJoin(ordOrphans)))
      .unionByName(evChecks)
      .unionByName(shape("5_documents_blank_text",
        t(s, d, "documents").agg(count(lit(1)).as("n_total"),
          count(when(col("text").isNull || trim(col("text")) === "", 1))
            .as("n_violations"))))
      .orderBy("check_name")
  }

  // ---------------------------------------------------------------- q117
  /** INCREMENTAL VIEW MAINTENANCE for an aggregate — the update path of a
    * materialized per-type revenue rollup: a base aggregate (events before
    * the cutoff — the "materialized view") is REFRESHED with only the
    * delta partition's partial aggregate, never rescanning the base. The
    * merge is the associative-state discipline the engine's aggregates
    * already follow (count and decimal-cents sum are both mergeable), so
    * base ⊕ delta is provably the full recompute — which is exactly what
    * the oracle checks: the output exposes the base/delta decomposition
    * next to totals that a single full-table GROUP BY must reproduce.
    *
    * Scale: the base aggregate is |groups|-sized state (what a warehouse
    * stores as the view); each refresh scans ONLY the delta — at 100 TB
    * with daily deltas that is the difference between a 100 TB scan per
    * refresh and a 100 GB one. The merge itself is a full-outer join of
    * two |groups|-row frames. */
  def q117IvmAgg(s: SparkSession, d: String,
                 cutoff: String = "2024-01-21T00:00:00"): DataFrame = {
    val cutUs = lit(java.time.LocalDateTime.parse(cutoff)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
    val cents = graft.streaming.EventsStream.cents(col("value"))
    val ev = t(s, d, "events")
      .select(col("event_type"), expr("ts div 1000").as("tus"), cents.as("c"))
    def rollup(part: DataFrame, pfx: String): DataFrame =
      part.groupBy("event_type")
        .agg(count(lit(1)).as(s"n_$pfx"), sum(col("c")).as(s"s_$pfx"))
    // the split must PARTITION the table: a null-ts row fails both `<`
    // and `>=`, so base takes the complement of delta explicitly — the
    // merge-equals-recompute invariant the oracle checks is total
    val base = rollup(ev.filter(col("tus") < cutUs || col("tus").isNull), "base")
    val delta = rollup(ev.filter(col("tus") >= cutUs), "delta")
    base.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
          .as("n_total"),
        ((coalesce(col("s_base"), lit(0L)) + coalesce(col("s_delta"), lit(0L)))
          .cast("double") / 100.0).as("sum_value"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q165
  /** INCREMENTAL VIEW MAINTENANCE for a JOIN view — q117's discipline
    * extended from a single-table aggregate to a two-table join view
    * (revenue per order priority over lineitem ⋈ orders). The classic
    * delta-join decomposition: with L = L_old ∪ ΔL and O = O_old ∪ ΔO,
    *
    *   ΔV = ΔL ⋈ O  ∪  L_old ⋈ ΔO
    *
    * covers the three new-row terms exactly once (ΔL⋈ΔO rides the first
    * term; the second joins only the OLD lineitem side), so the stored
    * view V_old = L_old ⋈ O_old refreshed with ΔV must equal the full
    * recompute — which is exactly what the oracle checks: the output
    * exposes the base/delta decomposition beside totals that a single
    * full join + GROUP BY must reproduce.
    *
    * Scale: a refresh scans ONLY the delta partitions of each input (at
    * 100 TB with daily deltas, a ~0.1% read instead of a full re-join);
    * each delta term shuffles |Δ| rows against the join key — and when
    * the delta is small enough, AQE turns those into broadcast joins at
    * runtime. The merge is a |groups|-row full-outer join. Revenue stays
    * an UNROUNDED decimal product-sum per term (mergeable exactly) and is
    * rounded ONCE after the base⊕delta merge, so incremental equals
    * recompute to the last bit — the q117 associative-state rule applied
    * to the join case. Null dates land in the base partition via the
    * coalesced flags, keeping the split a true partition of the table. */
  def q165IvmJoin(s: SparkSession, d: String,
                  cutoff: String = "2000-06-01T00:00:00"): DataFrame = {
    val cut = tsLit(cutoff)
    val rev = (col("l_extendedprice").cast(DecimalType(12, 4)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(12, 4))).as("rev")
    val l = t(s, d, "lineitem").select(col("l_orderkey"), rev,
      coalesce(ntz(col("l_shipdate")) >= cut, lit(false)).as("l_new"))
    val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"),
      coalesce(ntz(col("o_orderdate")) >= cut, lit(false)).as("o_new"))
    val lOld = l.filter(!col("l_new"))
    val oOld = o.filter(!col("o_new"))
    def roll(df: DataFrame, pfx: String): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as(s"n_$pfx"), sum(col("rev")).as(s"r_$pfx"))
    val base = roll(lOld.join(oOld, col("l_orderkey") === col("o_orderkey")), "base")
    // ΔL joins the FULL order side; ΔO joins only OLD lineitems — the
    // ΔL⋈ΔO corner lives in the first term and is never double-counted
    val dl = l.filter(col("l_new")).join(o, col("l_orderkey") === col("o_orderkey"))
    val dO = lOld.join(o.filter(col("o_new")), col("l_orderkey") === col("o_orderkey"))
    val delta = roll(dl.unionByName(dO), "delta")
    base.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
          .as("n_total"),
        round(coalesce(col("r_delta"), lit(0)), 2).cast("double").as("rev_delta"),
        round(coalesce(col("r_base"), lit(0)) + coalesce(col("r_delta"), lit(0)), 2)
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------- q119
  /** Week-over-week MOVERS — the trend-break report over the per-type
    * revenue series: integer epoch-weeks (q82's calendar-free week math),
    * exact cents sums per (type, week), and a lag window that only pairs
    * CONSECUTIVE weeks (a gap week yields no delta row rather than a
    * misleading long-range diff). Top movers rank by |delta| with a
    * deterministic tiebreak. All arithmetic is long cents until the final
    * /100.0 rescales; the window partitions by event type, so the series
    * state never concentrates on one task. */
  def q119WowMovers(s: SparkSession, d: String, topK: Int = 15): DataFrame = {
    val cents = graft.streaming.EventsStream.cents(col("value"))
    val wk = t(s, d, "events")
      .select(col("event_type"),
        expr("(ts div 1000) div 604800000000").as("week"), cents.as("c"))
      .groupBy("event_type", "week")
      .agg(sum(col("c")).as("sc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("week")
    wk.withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("prev_sc", lag(col("sc"), 1).over(w))
      .filter(col("prev_week") === col("week") - 1)
      // rank on the exact cents delta, not its double rescale
      .orderBy(abs(col("sc") - col("prev_sc")).desc, col("event_type"), col("week"))
      .limit(topK)
      .select(col("event_type"), col("week"),
        (col("sc").cast("double") / 100.0).as("sum_value"),
        (col("prev_sc").cast("double") / 100.0).as("prev_value"),
        ((col("sc") - col("prev_sc")).cast("double") / 100.0).as("delta"))
  }

  // ---------------------------------------------------------------- q120
  /** LAST-TOUCH ATTRIBUTION — credit each purchase to the user's most
    * recent click within the attribution window (1 h), keyed by the
    * click's campaign id (`props.k`); purchases with no in-window click
    * fall into the organic bucket (-1). The per-purchase PICK-ONE is what
    * distinguishes attribution from q63's interval aggregate (which counts
    * every purchase per click).
    *
    * The pick is [[AsofJoin.backward]] — one union + window pass per key,
    * the sort-merge shape that replaces the O(clicks×purchases)-per-user
    * naive range join — followed by a window-bound credit test and a
    * campaign rollup in exact cents. DuckDB's native ASOF LEFT JOIN
    * replicates the pick, so the whole report keeps an exact oracle.
    *
    * Tie caveat (shared with q25): among clicks at the IDENTICAL
    * microsecond for one user, the engine picks deterministically (max
    * (click_tus, campaign) struct) while DuckDB's ASOF has no documented
    * tie order — the oracle claim assumes per-user-distinct click
    * timestamps, which µs-resolution event streams satisfy in practice. */
  def q120LastTouch(s: SparkSession, d: String,
                    windowUs: Long = 3600L * 1000000L): DataFrame = {
    val ev = t(s, d, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        expr("ts div 1000").as("click_tus"),
        get_json_object(col("props"), "$.k").cast("int").as("campaign"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        graft.streaming.EventsStream.cents(col("value")).as("cents"))
    AsofJoin.backward(purchases, clicks,
      key = "user_id", time = "tus", attach = Seq("click_tus", "campaign"))
      .select(col("cents"),
        // an in-window click with no campaign id can't be credited →
        // organic; also keeps the group key non-null (Spark and DuckDB
        // order NULL groups on opposite ends)
        when(col("click_tus").isNotNull && col("tus") - col("click_tus") <= windowUs
          && col("campaign").isNotNull,
          col("campaign")).otherwise(lit(-1)).as("campaign"))
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_purchases"),
        (sum(col("cents")).cast("double") / 100.0).as("sum_value"))
      .orderBy("campaign")
  }

  // ---------------------------------------------------------------- q247
  /** SECONDARY SORT — the MapReduce-era pattern in its Spark form:
    * `repartition(key)` + `sortWithinPartitions(key, order)` + a
    * sequential `mapPartitions` scan holding per-key state — the shape
    * for per-key logic that is INHERENTLY sequential (legacy parsers,
    * protocol state machines, order-sensitive folds). The demonstrator
    * is each user's longest strictly-increasing run of purchase values
    * in event-time order; this particular statistic IS window-expressible
    * (the oracle uses the lag/reset-counter form — that equivalence is
    * the correctness check), but the execution pattern is the point: one
    * hash exchange, an in-partition sort, and an O(1)-state linear scan
    * that never materializes a per-user collection. */
  def q247SecondarySort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = s.sessionState.conf.numShufflePartitions
    val sorted = t(s, d, "events")
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .repartition(n, col("user_id"))
      .sortWithinPartitions("user_id", "tus", "event_id")
      .as[(Long, Long, Long, Long)]
    sorted.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var cur = Long.MinValue
      var nEv = 0L; var run = 0L; var best = 0L; var prevC = 0L
      def close(): Unit = if (nEv > 0) out += ((cur, nEv, best))
      it.foreach { case (u, _, _, c) =>
        if (u != cur) { close(); cur = u; nEv = 0L; run = 0L; best = 0L }
        nEv += 1
        run = if (nEv > 1 && c > prevC) run + 1 else 1
        if (run > best) best = run
        prevC = c
      }
      close()
      out.iterator
    }.toDF("user_id", "n_events", "longest_run").orderBy("user_id")
  }

  // ---------------------------------------------------------------- q248
  /** ACCUMULATOR AUDIT — SparkContext long accumulators as the task-side
    * tally channel (the third observability face: q234 observes METRICS
    * on a flowing Dataset, slf4j logs cover O9, accumulators count
    * per-row conditions inside task code where no Dataset column
    * exists). The demonstrator counts quality-rejected rows inside the
    * pass itself. Honesty note for 100 TB: accumulators are
    * AT-LEAST-ONCE under task retry/speculation — monitoring, not
    * correctness — which is exactly why the emitted row can be (and is)
    * hash-checked against the exact aggregate: in a clean run the two
    * channels must agree, and the oracle proves the plumbing counted
    * every row exactly once. */
  def q248AccumulatorAudit(s: SparkSession, d: String): DataFrame = {
    val total = s.sparkContext.longAccumulator("graft_q248_rows")
    val rejected = s.sparkContext.longAccumulator("graft_q248_rejected")
    val kSum = s.sparkContext.longAccumulator("graft_q248_ksum")
    // java.lang.Long, not Long: a primitive-arg UDF is SKIPPED on NULL
    // input (Spark returns null without invoking it), which would
    // silently undercount rows whose props lack a parseable k
    val tally = udf((k: java.lang.Long) => {
      total.add(1L)
      if (k != null) {
        if (k % 7L == 0L) rejected.add(1L)
        kSum.add(k.longValue)
      }
      k
    })
    val flow = t(s, d, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .select(tally(col("k")).as("k"))
    flow.write.format("noop").mode("overwrite").save()
    import s.implicits._
    Seq((total.value.longValue, rejected.value.longValue,
      kSum.value.longValue))
      .toDF("n_rows", "n_rejected", "k_sum")
  }

  // ---------------------------------------------------------------- q239
  /** OUT-OF-ORDERNESS AUDIT — the measurement that SIZES a watermark:
    * replay each type's events in ARRIVAL order (event_id — the ingest
    * sequence) and compare every event's time against the running
    * maximum seen so far; the regression depth distribution is exactly
    * the lateness a `withWatermark` delay must cover (q135 audits late
    * rows against a GIVEN watermark; this derives the delay itself).
    * Per type: arrival count, regression count/share, max depth, and the
    * depth that covers 99% of arrivals (the value you'd actually set),
    * computed by exact rank over the regression-depth grid — integer µs
    * everywhere. One per-type window over arrival order (running max is
    * O(1) per row), one depth-grid aggregate; nothing row-scaled leaves
    * the partition. */
  def q239OooAudit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val depths = t(s, d, "events")
      .select(col("event_type"), col("event_id"),
        expr("ts div 1000").as("tus"))
      .withColumn("hwm", max("tus").over(w))
      .select(col("event_type"),
        greatest(col("hwm") - col("tus"), lit(0L)).as("depth"))
    val grid = depths.groupBy("event_type", "depth")
      .agg(count(lit(1)).as("cnt"))
    val wd = Window.partitionBy("event_type").orderBy("depth")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy("event_type")
    grid
      .withColumn("cum", sum("cnt").over(wd))
      .withColumn("n", sum("cnt").over(wn))
      .groupBy("event_type")
      .agg(first("n").as("n_events"),
        sum(when(col("depth") > 0L, col("cnt")).otherwise(0L))
          .as("n_late"),
        max("depth").as("max_depth_us"),
        min(when(col("cum") * 100L >= col("n") * 99L, col("depth")))
          .as("p99_depth_us"))
      .select(col("event_type"), col("n_events"), col("n_late"),
        expr("n_late * 10000 div n_events").as("late_bp"),
        col("max_depth_us"), col("p99_depth_us"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q215
  /** MULTI-TOUCH LINEAR ATTRIBUTION — the fairness upgrade over q120's
    * last-touch: every campaign click in the hour before a purchase
    * shares the credit equally. The split is EXACT by construction:
    * credit lives in integer micro-units (10⁶ per purchase), each of the
    * n touches gets ⌊10⁶/n⌋ and the REMAINDER (10⁶ mod n) goes to the
    * most recent touch — so Σcredit ≡ 10⁶ per purchase identically, no
    * float leakage, and the invariant is spec-pinned. Untouched
    * purchases keep their full 10⁶ under campaign −1 (organic).
    * Attributed revenue accumulates as cents×credit in DECIMAL(38,0)
    * (the q115 widening rule: micro-cents overflow a long at corpus
    * scale) and exports portably.
    *
    * Scale: the touch join is an equi-join on user_id with a window
    * band filter — per-user click×purchase pairs, bounded by per-user
    * activity (the same shape as q63's interval join); the per-purchase
    * count/rank windows partition on purchase id (well-spread); the
    * final rollup is |campaigns|-sized. */
  def q215MultitouchAttribution(s: SparkSession, d: String,
                                windowUs: Long = 3600L * 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val ev = t(s, d, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("ctus"),
        col("event_id").as("cid"),
        get_json_object(col("props"), "$.k").cast("int").as("campaign"))
      .filter(col("campaign").isNotNull)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("ptus"),
        col("event_id").as("pid"),
        graft.streaming.EventsStream.cents(col("value")).as("cents"))
    val touched = purchases.join(clicks, Seq("user_id"))
      .filter(col("ctus") <= col("ptus") && col("ctus") > col("ptus") - windowUs)
    val touchedPids = touched.select("pid").distinct()
    val organic = purchases.join(touchedPids, Seq("pid"), "left_anti")
      .select(col("pid"), col("cents"), lit(-1).as("campaign"),
        lit(1000000L).as("credit"))
    val wCnt = Window.partitionBy("pid")
    val wRk = Window.partitionBy("pid").orderBy(col("ctus").desc, col("cid"))
    val split = touched
      .withColumn("n", count(lit(1)).over(wCnt))
      .withColumn("rk", row_number().over(wRk))
      .select(col("pid"), col("cents"), col("campaign"),
        (expr("1000000L div n") +
          when(col("rk") === 1, expr("1000000L % n")).otherwise(0L)).as("credit"))
    Tables.portable(split.unionByName(organic)
      .groupBy("campaign")
      .agg(countDistinct("pid").as("n_purchases"),
        sum("credit").as("credit_micro"),
        sum(col("cents").cast(dec38) * col("credit")).as("rev_micro_cents"))
      .orderBy("campaign"))
  }

  // ---------------------------------------------------------------- q216
  /** SEQUENTIAL ASSOCIATION RULES — "users who do A tend to do B LATER":
    * the order-aware sibling of q132's basket lift and q107's adjacent
    * transitions. Support of A→B counts users with SOME occurrence of A
    * before SOME occurrence of B, which needs only each user's per-type
    * (min_ts, max_ts) — A→B holds iff min_ts(A) < max_ts(B) — so the
    * whole mining pass is LINEAR: one (user, type) aggregate, a per-user
    * self-join over ≤|types| rows, one pair rollup. Confidence is
    * support(A→B) / support(A) in integer basis points. Classic
    * PrefixSpan-style episode mining collapses to exactly this for
    * length-2 patterns — and length-2 rules are what drive "next action"
    * dashboards.
    *
    * Exact end to end: timestamps µs longs, supports counts, confidence
    * integer div. */
  def q216SeqRules(s: SparkSession, d: String): DataFrame = {
    val spans = t(s, d, "events")
      .groupBy(col("user_id"), col("event_type").as("et"))
      .agg(min(expr("ts div 1000")).as("lo"), max(expr("ts div 1000")).as("hi"))
    val a = spans.select(col("user_id"), col("et").as("ante"), col("lo"))
    val b = spans.select(col("user_id"), col("et").as("cons"), col("hi"))
    val pairs = a.join(b, Seq("user_id"))
      .filter(col("ante") =!= col("cons") && col("lo") < col("hi"))
      .groupBy("ante", "cons")
      .agg(countDistinct("user_id").as("support"))
    val antSup = spans.groupBy(col("et").as("ante"))
      .agg(countDistinct("user_id").as("ante_support"))
    pairs.join(antSup, "ante")
      .select(col("ante"), col("cons"), col("support"), col("ante_support"),
        expr("(10000 * support) div ante_support").as("confidence_bp"))
      .orderBy(col("support").desc, col("ante"), col("cons"))
  }

  // ---------------------------------------------------------------- q122
  /** COHORT LTV TRIANGLE — cumulative revenue per acquisition cohort by
    * week-since-acquisition: the lifetime-value view that q82's retention
    * grid (activity yes/no) cannot give. Users cohort by their FIRST
    * activity week (integer epoch-weeks, q82's calendar-free math);
    * purchase revenue lands in (cohort, weeks_since) cells; the triangle
    * densifies over each cohort's observable span (a zero-revenue week
    * must appear — the cumulative curve is defined there) and a window
    * cumsum in exact long cents produces the LTV curve; per-user LTV is
    * one final IEEE division by the cohort size.
    *
    * Scale: one events scan for cohorts (min-week per user, partial-agg),
    * one for revenue; the densified triangle is |cohorts|·|weeks| rows —
    * calendar-bounded, not data-bounded (the q98 sweep-line argument) —
    * so the cumsum window runs over a tiny frame. */
  def q122CohortLtv(s: SparkSession, d: String): DataFrame = {
    val wkExpr = expr("(ts div 1000) div 604800000000")
    val cents = graft.streaming.EventsStream.cents(col("value"))
    cohortLtv(t(s, d, "events")
      .select(col("user_id"), col("event_type"), wkExpr.as("week"), cents.as("c")))
  }

  /** Triangle core over any (user_id, event_type, week, c) frame — the
    * testable unit (the driver corpus collapses to one cohort; specs feed
    * multi-cohort frames through here). */
  def cohortLtv(ev: DataFrame): DataFrame = {
    val cohorts = ev.groupBy("user_id").agg(min(col("week")).as("cw"))
    val maxWeek = ev.agg(max(col("week")).as("mw"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(cohorts, "user_id")
      .groupBy(col("cw"), (col("week") - col("cw")).as("ws"))
      .agg(sum(col("c")).as("rc"))
    val sizes = cohorts.groupBy("cw").agg(count(lit(1)).as("n_users"))
    val grid = sizes.crossJoin(broadcast(maxWeek))
      .select(col("cw"), col("n_users"),
        explode(sequence(lit(0L), col("mw") - col("cw"))).as("ws"))
    grid.join(rev, Seq("cw", "ws"), "left")
      .select(col("cw").as("cohort_week"), col("ws").as("weeks_since"),
        col("n_users"), coalesce(col("rc"), lit(0L)).as("rc"))
      .withColumn("cum_rc", sum(col("rc")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cohort_week").orderBy("weeks_since")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("cohort_week"), col("weeks_since"), col("n_users"),
        (col("rc").cast("double") / 100.0).as("week_revenue"),
        (col("cum_rc").cast("double") / 100.0).as("cum_revenue"),
        (col("cum_rc").cast("double") / (lit(100.0) * col("n_users").cast("double")))
          .as("ltv_per_user"))
      .orderBy("cohort_week", "weeks_since")
  }

  // ---------------------------------------------------------------- q124
  /** POINT-IN-TIME (temporal) dimension join — attach to every fact row
    * the dimension VERSION that was in effect at the fact's own timestamp,
    * the standard warehouse read of an SCD2 history (q93 builds the
    * history; this query consumes it): each shipped lineitem of the
    * tracked customers joins the purchasing-state version valid at its
    * ship time, then rolls up shipped items/quantity/revenue per version.
    *
    * The naive form is an interval join (`valid_from <= ts < valid_to`) —
    * a per-key O(facts×versions) nested loop. Because SCD2 intervals TILE
    * (each version runs to the next one's start), the pick is exactly a
    * backward as-of against the version-start feed, so the operator reuses
    * [[AsofJoin.backward]]: one union + window pass, sort-merge cost, the
    * same shape at any scale. `valid_to` never needs to exist.
    *
    * Determinism: same-day orders collapse to the LAST version (max
    * (orderkey, totalprice) struct) BEFORE versioning — a version
    * superseded the same instant is never visible to any fact, and it
    * leaves version starts unique per key, so DuckDB's ASOF JOIN (which
    * has no documented tie order) is deterministic too. Facts at exactly
    * a version's start see that version (>= contract, both engines).
    * Quantity/revenue accumulate in exact long cents; `state_price` is a
    * raw passthrough double. Facts earlier than their key's FIRST version
    * have no version in effect — inner ASOF semantics exclude them in
    * both engines (the standard PIT contract; the spec counts them). */
  def q124PitJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = graft.streaming.EventsStream.cents _
    val o = t(s, d, "orders").filter(col("o_custkey") % 20 === 1)
    val hist = o
      .groupBy(col("o_custkey").as("custkey"), ntz(col("o_orderdate")).as("pit_ts"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("eff"))
      .select(col("custkey"), col("pit_ts"), col("eff.o_totalprice").as("state_price"))
      .withColumn("version",
        row_number().over(Window.partitionBy("custkey").orderBy("pit_ts")).cast("long"))
    val facts = t(s, d, "lineitem")
      .join(o.select(col("o_orderkey"), col("o_custkey").as("custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("custkey"), ntz(col("l_shipdate")).as("pit_ts"),
        cents(col("l_quantity")).as("qc"), cents(col("l_extendedprice")).as("pc"))
    AsofJoin.backward(facts, hist, key = "custkey", time = "pit_ts",
        attach = Seq("version", "state_price"))
      .filter(col("version").isNotNull)
      .groupBy("custkey", "version")
      .agg(max(col("state_price")).as("state_price"),
        count(lit(1)).as("n_items"),
        (sum(col("qc")).cast("double") / 100.0).as("sum_qty"),
        (sum(col("pc")).cast("double") / 100.0).as("revenue"))
      .orderBy("custkey", "version")
  }

  // ---------------------------------------------------------------- q130
  /** TIME-WEIGHTED average (TWAP) per user — the right mean for IRREGULAR
    * observations (sensor reads, price ticks, metric gauges): each value
    * holds until the next observation, so it weighs by its holding
    * duration, not by its count — a burst of 100 reads in one second must
    * not dominate a value that held for an hour. The q95 LOCF grid
    * resamples then averages; TWAP integrates the step function directly,
    * with no grid resolution to pick.
    *
    * Exact integer core: timestamps floor to μs (`ts div 1000`, the
    * engine-wide events convention), values to cents, and Σ v_i·Δt_i
    * accumulates in DECIMAL(38,0) — cents×μs terms overflow a long at
    * corpus durations, the q115 widening rule. The final TWAP is ONE IEEE
    * division of exact integers (μs-cents / μs-total), then /100. The
    * last observation carries no weight (nothing is observed after it);
    * same-μs ties contribute zero-duration segments — deterministic
    * either way. Users with a single observation (or an all-ties span of
    * zero) have no time axis and are excluded by contract.
    *
    * Scale: one shuffle (user partition for the lead window), then the
    * per-user aggregate rides the same partitioning. */
  def q130Twap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec38 = DecimalType(38, 0)
    val cents = graft.streaming.EventsStream.cents _
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    t(s, d, "events")
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        cents(col("value")).as("vc"), col("event_id"))
      .withColumn("dur", coalesce(lead(col("tus"), 1).over(w) - col("tus"), lit(0L)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_obs"),
        (max(col("tus")) - min(col("tus"))).as("span_us"),
        sum(col("vc").cast(dec38) * col("dur")).as("wsum"))
      .filter(col("span_us") > 0)
      .select(col("user_id"), col("n_obs"), col("span_us"),
        (col("wsum").cast("double")
          / (col("span_us") * 100L).cast("double")).as("twap"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q131
  /** Hourly PERCENTILE BANDS per event type — the SLA/observability read
    * of a metric stream: for each (event_type, hour) cell, the median and
    * a tail quantile of `value`. The tail fraction is 15/16 = 0.9375, ON
    * PURPOSE: with values quantized to integer cents, a DYADIC fraction
    * makes every step of the interpolation exact in ANY IEEE engine —
    * (n−1)·(15/16) is an exact product, the fractional part is dyadic,
    * and lo + (hi−lo)·frac multiplies sub-2⁵³ integers by dyadic
    * rationals with zero rounding — so Spark's percentile() and DuckDB's
    * quantile_cont() agree bit-for-bit BY CONSTRUCTION, not by luck (the
    * q103/q116 integer-grid discipline; a 0.95 tail would instead hinge
    * on both engines grouping the interpolation identically).
    *
    * Hours are integer `tus div 3600e6` buckets (the q82 calendar-free
    * convention). Scale: one shuffle to (type, hour) cells; the exact
    * per-cell sort is bounded by the cell's row count — at 100 TB switch
    * the same query to approx_percentile per cell, losing the oracle but
    * keeping the shape. */
  def q131PercentileBands(s: SparkSession, d: String): DataFrame = {
    val cents = graft.streaming.EventsStream.cents _
    t(s, d, "events")
      .select(col("event_type"), expr("(ts div 1000) div 3600000000").as("hour"),
        cents(col("value")).as("vc"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n"),
        (percentile(col("vc"), lit(0.5)) / 100.0).as("p50"),
        (percentile(col("vc"), lit(0.9375)) / 100.0).as("p9375"))
      .orderBy("event_type", "hour")
  }

  // ---------------------------------------------------------------- q132
  /** MARKET-BASKET co-occurrence with LIFT — association analysis over
    * event types: each user's basket is the SET of event types they ever
    * produced; for every type pair, the co-occurrence count, support and
    * lift = P(a∧b)/(P(a)·P(b)) (lift > 1: seeing `a` makes `b` more
    * likely — the cross-sell/funnel-design signal; q90's PMI is ln(lift)
    * over token space, this is the transactional member of the family).
    *
    * Scale: baskets dedupe to (user, type) with map-side combine; pair
    * fan-out is per-user C(|basket|,2) ≤ C(|type domain|,2) — bounded by
    * the DOMAIN, not the event count — and pair counts aggregate on a
    * domain²-sized key space. The singleton counts and user total ride a
    * broadcast. Lift's integer products widen to DECIMAL(38,0) before the
    * one double division each (q115 rule), so the report is engine-exact. */
  def q132BasketLift(s: SparkSession, d: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val baskets = t(s, d, "events").select(col("user_id"), col("event_type")).distinct()
    val users = baskets.agg(countDistinct(col("user_id")).as("n_users"))
    val singles = baskets.groupBy("event_type").agg(count(lit(1)).as("n_single"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"),
        col("n_single").as("n_a"))), "type_a")
      .join(broadcast(singles.select(col("event_type").as("type_b"),
        col("n_single").as("n_b"))), "type_b")
      .crossJoin(broadcast(users))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_users").cast("double")).as("support"),
        ((col("n_ab").cast(dec38) * col("n_users")).cast("double")
          / (col("n_a").cast(dec38) * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("type_a"), col("type_b"))
  }

  // ---------------------------------------------------------------- q133
  /** EWMA SMOOTHING, engine-exact — the classic "exponentially weighted
    * moving average is inherently float-recursive" objection, dissolved by
    * picking α = 1/2 (dyadic) and truncating to the last 16 observations:
    * lag k carries integer weight c_k = 2^(15−k) (the 10^16 scaling that
    * would make these the literal EWMA coefficients cancels in the
    * ratio, and DROPPING it is what keeps both Σ v_k·c_k and Σ c_k under
    * 2^53 — exactly representable doubles, so even an engine whose
    * wide-integer→double cast rounds sloppily, as DuckDB's HUGEINT cast
    * measurably does at ~5e19, computes the identical result). The
    * smoothed value is a ratio of two exact LONG sums; the only float ops
    * are the final two divisions (deterministic IEEE on deterministic
    * operands). Early rows with fewer than 16 predecessors renormalize
    * over the weights actually present, so the head of each series is a
    * true weighted mean, not a damped ramp from zero. Lag-16+ history
    * carries weight < 2⁻¹⁶ in the untruncated EWMA — below the cents
    * quantization, which is what makes the truncation honest.
    *
    * Scale: ONE window pass per user (all 32 lag terms share the frame),
    * no self-joins, state bounded at 16 rows regardless of series length
    * — the same shape a Structured-Streaming port would keep per key. */
  def q133EwmaSmooth(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val cents = graft.streaming.EventsStream.cents _
    val c = (0 until 16).map(k => 1L << (15 - k))
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    // weighted numerator in DECIMAL(38,0): cents are bounded only by the
    // DECIMAL(18,2) grid, and cents·2^15 overflows a raw long there
    // (oracle: HUGEINT)
    val num = (0 until 16).map { k =>
      val l = lag(col("vc"), k).over(w)
      when(l.isNotNull, l.cast(dec38) * c(k)).otherwise(lit(0L).cast(dec38))
    }.reduce(_ + _)
    val den = (0 until 16).map { k =>
      val l = lag(col("vc"), k).over(w)
      when(l.isNotNull, lit(c(k))).otherwise(lit(0L))
    }.reduce(_ + _)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"),
        cents(col("value")).as("vc"))
      .select(col("user_id"), col("event_id"), col("tus"),
        (col("vc").cast("double") / 100.0).as("value"),
        // CENT-QUANTIZED smoother (trunc num/den, then one exact /100):
        // the raw num/den double needed num→double, which DuckDB does NOT
        // round correctly past 2^53 (q134's finding) — the cent grid is
        // the widest export both engines render identically, and a money
        // smoother at cent resolution is the honest contract anyway
        (Tables.decTruncDiv(num, den.cast(dec38)).cast("double") / 100.0)
          .as("ewma"))
      .orderBy("user_id", "tus", "event_id")
  }

  // ---------------------------------------------------------------- q134
  /** INCREMENTAL VARIANCE maintenance — q117's IVM contract extended to
    * second moments: the maintained state per key is the integer partial
    * (n, Σc, Σc²) in cents, which MERGES EXACTLY in any order — the
    * float-domain alternative (Chan's pairwise mean/M2 update) drifts
    * with merge shape, which is precisely what an incremental view must
    * never do. Refresh cost is the delta scan; the oracle recomputes the
    * whole table single-pass and the merged path must equal it.
    *
    * The one subtle exactness step is REPORTING variance: the closed
    * formula's numerator n·Σc² − (Σc)² reaches ~1e24 — past 2^53, where
    * DuckDB's wide-int→double casts are measurably NOT correctly rounded
    * (q133 found this; 8% of 66-bit values drift an ulp). So the variance
    * quantizes on the integer grid FIRST: one exact integral division
    * (num div n(n−1), truncation ≤ 1 cent² — Spark decimal `div` and
    * DuckDB HUGEINT `//` are both exact) yields a quotient small enough
    * that every later double op is on sub-2^53 operands. n < 2 reports
    * NULL variance, never a divide-by-zero. */
  def q134IvmMoments(s: SparkSession, d: String,
                     cutoff: String = "2024-01-21T00:00:00"): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val cutUs = lit(java.time.LocalDateTime.parse(cutoff)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
    val cents = graft.streaming.EventsStream.cents(col("value"))
    val ev = t(s, d, "events")
      .select(col("event_type"), expr("ts div 1000").as("tus"), cents.as("c"))
    def rollup(part: DataFrame, pfx: String): DataFrame =
      part.groupBy("event_type")
        .agg(count(lit(1)).as(s"n_$pfx"), sum(col("c")).as(s"s_$pfx"),
          sum(col("c").cast(dec38) * col("c")).as(s"s2_$pfx"))
    val base = rollup(ev.filter(col("tus") < cutUs || col("tus").isNull), "base")
    val delta = rollup(ev.filter(col("tus") >= cutUs), "delta")
    val z = lit(0L).cast(dec38)
    base.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L))).as("n"),
        (coalesce(col("s_base"), lit(0L)) + coalesce(col("s_delta"), lit(0L))).as("sc"),
        (coalesce(col("s2_base"), z) + coalesce(col("s2_delta"), z)).as("s2"))
      .select(col("event_type"), col("n"),
        (col("sc").cast("double") / col("n").cast("double") / 100.0).as("mean_value"),
        when(col("n") > 1,
          expr("(n * s2 - cast(sc as decimal(38,0)) * sc) div (n * (n - 1))"))
          .as("var_cents2"))
      .withColumn("var_value", col("var_cents2").cast("double") / 10000.0)
      .withColumn("stddev_value", sqrt(col("var_value")))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q135
  /** LATE-DATA audit — the batch answer to "what watermark delay would
    * this stream need?": events are replayed in ARRIVAL order (event_id,
    * within synthetic ingest partitions — the per-partition-ordered model
    * Kafka and Spark's file source actually provide; a global arrival
    * order would also make the running-max window a single task, which is
    * exactly the shape this engine refuses), each event's lateness is how
    * far its event time sits behind the partition's high-water mark at
    * arrival, and the report counts, per event type, how many events a
    * 1-minute / 10-minute / 1-hour watermark delay would have dropped —
    * the q71/q108 streaming operators consume precisely this delay
    * parameter, so the audit is their sizing tool.
    *
    * All integer-μs math (running max, subtraction, threshold compares);
    * the only shuffle is the ingest-partition window plus the per-type
    * rollup. Exact DuckDB oracle. */
  def q135LateDataAudit(s: SparkSession, d: String,
                        nPartitions: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("part").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, d, "events")
      .select(col("event_type"), col("event_id"),
        pmod(col("event_id"), lit(nPartitions)).as("part"),
        expr("ts div 1000").as("tus"))
      .withColumn("hwm", max(col("tus")).over(w))
      .withColumn("late_us", greatest(coalesce(col("hwm") - col("tus"), lit(0L)), lit(0L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(when(col("late_us") > 60000000L, 1)).as("n_late_1m"),
        count(when(col("late_us") > 600000000L, 1)).as("n_late_10m"),
        count(when(col("late_us") > 3600000000L, 1)).as("n_late_1h"),
        max(col("late_us")).as("max_late_us"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q138
  /** Event DEBOUNCE (burst collapse) — the third member of the dedup-
    * by-time family (q71 drops exact redelivery, q80 keeps the latest per
    * key; this keeps the FIRST of each activity burst): events of the
    * same (user, type) chaining within `gapUs` collapse to their head
    * row, annotated with how many rows the burst absorbed and its span.
    * The UI/telemetry de-noising step — a button mashed 14 times in 3
    * seconds is one intent.
    *
    * Semantics are the q28 session contract (transitive ≤-gap chaining,
    * so the burst head is well-defined under any arrival order), NOT the
    * sequential "5 s since last kept" greedy — the greedy rule's output
    * depends on a per-key serial scan that no partitioned plan can
    * reproduce; the chained form is the one with a distributed shape (one
    * window per (user, type)) and a declarative oracle. Exact μs math. */
  def q138Debounce(s: SparkSession, d: String, gapUs: Long = 300000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("user_id", "event_type")
    val w = byKey.orderBy("tus", "event_id")
    t(s, d, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("tus"))
      .withColumn("fresh",
        when(col("tus") - lag(col("tus"), 1).over(w) <= gapUs, 0L).otherwise(1L))
      .withColumn("burst",
        sum(col("fresh")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "event_type", "burst")
      .agg(min(struct(col("tus"), col("event_id"))).as("head"),
        count(lit(1)).as("n_collapsed"),
        (max(col("tus")) - min(col("tus"))).as("span_us"))
      .select(col("user_id"), col("event_type"),
        col("head.event_id").as("event_id"), col("head.tus").as("tus"),
        col("n_collapsed"), col("span_us"))
      .orderBy("user_id", "event_type", "tus")
  }

  // ---------------------------------------------------------------- q155
  /** CUSUM CHANGE-POINT detection — for each event type, the day where the
    * cumulative deviation of daily revenue from its series mean peaks: the
    * classic single-change-point screen (Page's CUSUM evaluated offline),
    * run per series. The textbook statistic Σ_{i≤k}(x_i − x̄) involves the
    * non-integer mean, so the engine computes the n-SCALED twin instead:
    *
    *   CUSUM'_k = n·prefix_k − k·total   (≡ n · Σ_{i≤k}(x_i − x̄))
    *
    * which stays on the integer-cents grid end to end — prefix sums and
    * totals are exact longs, the two products ride DECIMAL(38,0) (a
    * 1000-day series over petabyte-scale daily revenue stays far inside
    * 38 digits), and argmax |CUSUM'| is an exact integer compare with a
    * pinned tie-break (equal mass → the EARLIER day, via max(struct(cu,
    * −day))). Only the two reporting divisions are IEEE, both on exact
    * sub-2^53 operands, so DuckDB lands on the identical doubles.
    *
    * Scale: the raw scan collapses to (type × day) rows immediately — the
    * windows that follow run over calendar-bounded series per type, never
    * over events, and partition by type (no single-partition sort). */
  def q155CusumChangepoint(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec38 = DecimalType(38, 0)
    val cents = graft.streaming.EventsStream.cents _
    val daily = t(s, d, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"),
        cents(col("value")).as("c"))
      .groupBy("event_type", "day")
      .agg(sum(col("c")).as("dc"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("pre",
        sum(col("dc")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("dc")).over(wAll))
      .withColumn("cu",
        abs(col("pre").cast(dec38) * col("n") - col("tot").cast(dec38) * col("k")))
      .groupBy("event_type")
      .agg(max(struct(col("cu").as("cu"), (-col("day")).as("nd"))).as("best"),
        max(col("n")).as("n_days"), max(col("tot")).as("tot"))
      .select(col("event_type"), col("n_days"),
        (col("tot") / 100.0).as("total_value"),
        (-col("best.nd")).as("change_day"),
        col("best.cu").cast("long").as("cusum_abs"),
        (col("best.cu").cast("double") / col("n_days").cast("double") / 100.0)
          .as("shift_value"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q156
  /** SESSION PATH MINING — the top behavioral 3-step paths: for every
    * user's event stream in (time, id) order, each consecutive event-type
    * triple is one path occurrence; paths are counted corpus-wide and the
    * head ranked by frequency. q107's transition matrix generalized from
    * pairs (first-order Markov) to order-preserving trigrams — the
    * product-analytics "what do users actually do" query.
    *
    * Shape: ONE window per user builds both lookaheads (lead 1 and 2
    * share the frame — no self-joins, no per-user collect), then the
    * corpus collapses to path-domain-sized counts (≤ |types|³ rows).
    * The share denominator crosses back as a broadcast single row, and
    * the head is a TakeOrderedAndProject. The only IEEE op is the final
    * share division on exact longs — both engines land identical doubles.
    * Deterministic under ties: ordered by (n DESC, path). */
  def q156SessionPaths(s: SparkSession, d: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val grams = t(s, d, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("tus"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(" > ", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
    val tot = grams.agg(sum(col("n")).as("tot"))
    grams.crossJoin(broadcast(tot))
      .select(col("path"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("share"))
      .orderBy(col("n").desc, col("path")).limit(topK)
  }

  // ---------------------------------------------------------------- q162
  /** FUNNEL CONVERSION CURVE with per-stage deadlines — q81 answered "how
    * many users converted"; this answers "how fast", under the windowed
    * contract real funnels use: a click counts only within `days` of the
    * user's first signup, a purchase only within `days` of that first
    * qualifying click, and each stage's conversions are bucketed by
    * whole-day latency into a dense 0..days−1 curve with cumulative
    * counts and rates. The time-to-convert distribution is the artifact
    * growth teams actually plot; the deadline is what makes it a funnel
    * rather than an unordered co-occurrence count.
    *
    * Shape: per-stage chained conditional min-aggregations exactly like
    * q81 (no per-user sort anywhere), then the corpus collapses to
    * ≤ stages × days rows — the densify join, cumsum window, and rate
    * division all run on that domain-bounded frame. Integer-μs latencies
    * and integer day buckets; the one IEEE division per row is on exact
    * sub-2^53 operands. Stage bases ride 1-row broadcast cross joins (no
    * driver collect). */
  def q162FunnelCurve(s: SparkSession, d: String, days: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val horizon = days * dayUs
    val e = t(s, d, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tus").as("t_s"))
    val cl = e.filter(col("event_type") === "click")
      .join(su, "user_id")
      .filter(col("tus") >= col("t_s") && col("tus") < col("t_s") + horizon)
      .groupBy("user_id").agg(min("tus").as("t_c"), min("t_s").as("t_s2"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(cl.select("user_id", "t_c"), "user_id")
      .filter(col("tus") >= col("t_c") && col("tus") < col("t_c") + horizon)
      .groupBy("user_id").agg(min("tus").as("t_p"), min("t_c").as("t_c2"))
    val dd = s.range(0, days).select(col("id").as("day_offset"))
    def curve(conv: DataFrame, from: String, to: String,
              base: DataFrame, stage: String): DataFrame = {
      val cnt = conv.select(expr(s"($to - $from) div $dayUs").as("day"))
        .groupBy("day").agg(count(lit(1)).as("n"))
      dd.join(cnt, dd("day_offset") === cnt("day"), "left")
        .crossJoin(broadcast(base))
        .select(lit(stage).as("stage"), col("day_offset"),
          coalesce(col("n"), lit(0L)).as("n"), col("base"))
    }
    val u = curve(cl, "t_s2", "t_c", su.agg(count(lit(1)).as("base")), "click")
      .unionAll(curve(pu, "t_c2", "t_p", cl.agg(count(lit(1)).as("base")), "purchase"))
    val w = Window.partitionBy("stage").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("cum_conv", sum(col("n")).over(w))
      .select(col("stage"), col("day_offset"), col("n").as("n_conv"),
        col("cum_conv"),
        when(col("base") > 0,
          col("cum_conv").cast("double") / col("base").cast("double"))
          .as("cum_rate"))
      .orderBy("stage", "day_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q239_ooo_audit" -> (q239OooAudit _),
    "q247_secondary_sort" -> (q247SecondarySort _),
    "q248_accumulator_audit" -> (q248AccumulatorAudit _),
    "q162_funnel_curve" -> ((s: SparkSession, d: String) => q162FunnelCurve(s, d)),
    "q156_session_paths" -> ((s: SparkSession, d: String) => q156SessionPaths(s, d)),
    "q155_cusum_changepoint" -> (q155CusumChangepoint _),
    "q138_debounce" -> ((s: SparkSession, d: String) => q138Debounce(s, d)),
    "q134_ivm_moments" -> ((s: SparkSession, d: String) => q134IvmMoments(s, d)),
    "q135_late_data_audit" -> ((s: SparkSession, d: String) => q135LateDataAudit(s, d)),
    "q152_nearest_event" -> (q152NearestEvent _),
    "q133_ewma_smooth" -> (q133EwmaSmooth _),
    "q130_twap" -> (q130Twap _),
    "q131_percentile_bands" -> (q131PercentileBands _),
    "q132_basket_lift" -> (q132BasketLift _),
    "q124_pit_join" -> (q124PitJoin _),
    "q123_linear_gapfill" -> (q123LinearGapfill _),
    "q122_cohort_ltv" -> (q122CohortLtv _),
    "q120_last_touch" -> ((s: SparkSession, d: String) => q120LastTouch(s, d)),
    "q215_multitouch_attribution" -> ((s: SparkSession, d: String) => q215MultitouchAttribution(s, d)),
    "q216_seq_rules" -> (q216SeqRules _),
    "q117_ivm_agg" -> ((s: SparkSession, d: String) => q117IvmAgg(s, d)),
    "q165_ivm_join" -> ((s: SparkSession, d: String) => q165IvmJoin(s, d)),
    "q119_wow_movers" -> ((s: SparkSession, d: String) => q119WowMovers(s, d)),
    "q114_integrity_audit" -> (q114IntegrityAudit _),
    "q180_fd_audit" -> (q180FdAudit _),
    "q106_snapshot_diff" -> (q106SnapshotDiff _),
    "q107_event_transitions" -> (q107EventTransitions _),
    "q98_open_intervals" -> (q98OpenIntervals _),
    "q142_rolling_actives" -> (q142RollingActives _),
    "q95_resample_ffill" -> (q95ResampleFfill _),
    "q93_scd2_history" -> (q93Scd2History _),
    "q73_merge_upsert" -> (q73MergeUpsert _),
    "q75_bloom_join" -> (q75BloomJoin _),
    "q80_latest_per_key" -> (q80LatestPerKey _),
    "q81_event_funnel" -> (q81EventFunnel _),
    "q82_retention_cohorts" -> (q82RetentionCohorts _))

  // ---------------------------------------------------------------- q152
  /** NEAREST-EVENT TEMPORAL JOIN — for every click, the same user's
    * purchase closest in ABSOLUTE time, either direction (the sensor- /
    * session-alignment semantics backward-only as-of can't express:
    * "which purchase does this click belong to" when attribution can be
    * anticipatory as well as causal). Composed as TWO passes of the
    * [[AsofJoin.backward]] union+window machinery — the second runs on
    * NEGATED time, which flips the ≤ contract into nearest-following —
    * then one row-local pick of the closer side. Each pass is a single
    * sort-merge-shaped window on (user, time): no range join, no
    * per-key nested loop, skew handled like any window skew.
    *
    * Tie discipline (spec-pinned, mirrored exactly by the oracle's
    * min(struct(dist, t, −id))): equal distance → the EARLIER purchase
    * (backward side); equal time among candidate purchases → the larger
    * event id (the as-of pass's max-attach-struct determinism). All
    * integer-μs arithmetic. */
  def q152NearestEvent(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus"))
    nearestEvent(
      e.filter(col("event_type") === "click")
        .select(col("user_id"), col("tus"), col("event_id").as("click_id")),
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), col("tus").as("p_tus"),
          col("event_id").as("p_id")))
  }

  /** Core of [[q152NearestEvent]]: `clicks` (user_id, tus, click_id) ×
    * `purch` (user_id, tus, p_tus, p_id) → nearest purchase per click. */
  def nearestEvent(clicks: DataFrame, purch: DataFrame): DataFrame = {
    val b = AsofJoin.backward(clicks, purch, "user_id", "tus",
        Seq("p_tus", "p_id"))
      .select(col("click_id"), col("p_tus").as("b_tus"),
        col("p_id").as("b_id"))
    val f = AsofJoin.backward(
        clicks.select(col("user_id"), (-col("tus")).as("ntus"),
          col("click_id")),
        purch.select(col("user_id"), (-col("tus")).as("ntus"),
          col("p_tus"), col("p_id")),
        "user_id", "ntus", Seq("p_tus", "p_id"))
      .select(col("click_id"), col("p_tus").as("f_tus"),
        col("p_id").as("f_id"))
    clicks.select(col("click_id"), col("user_id"),
        col("tus").as("click_tus"))
      .join(b, Seq("click_id"), "left")
      .join(f, Seq("click_id"), "left")
      .withColumn("b_dist", col("click_tus") - col("b_tus"))
      .withColumn("f_dist", col("f_tus") - col("click_tus"))
      .withColumn("pick_b", col("b_tus").isNotNull &&
        (col("f_tus").isNull || col("b_dist") <= col("f_dist")))
      .select(col("click_id"), col("user_id"), col("click_tus"),
        when(col("pick_b"), col("b_id")).otherwise(col("f_id")).as("p_id"),
        when(col("pick_b"), col("b_tus")).otherwise(col("f_tus")).as("p_tus"),
        when(col("pick_b"), col("b_dist")).otherwise(col("f_dist"))
          .as("dist_us"))
      .orderBy("click_id")
  }

  val oracle: Map[String, String] = Map(
    // same micro-unit split: floor share per touch, remainder to the most
    // recent touch, organic purchases keep the full 10^6 under -1
    "q215_multitouch_attribution" ->
      """WITH c AS (
        | SELECT user_id, epoch_us(ts) AS ctus, event_id AS cid,
        |  CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INT) AS campaign
        | FROM events WHERE event_type = 'click'
        |   AND CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END IS NOT NULL),
        |p AS (
        | SELECT user_id, epoch_us(ts) AS ptus, event_id AS pid,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM events WHERE event_type = 'purchase'),
        |touched AS (
        | SELECT p.pid, p.cents, c.campaign, c.ctus, c.cid
        | FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.ctus <= p.ptus AND c.ctus > p.ptus - 3600000000),
        |split AS (
        | SELECT pid, cents, campaign,
        |  1000000 // n + CASE WHEN rk = 1 THEN 1000000 % n ELSE 0 END AS credit
        | FROM (SELECT pid, cents, campaign,
        |        count(*) OVER (PARTITION BY pid) AS n,
        |        row_number() OVER (PARTITION BY pid ORDER BY ctus DESC, cid) AS rk
        |       FROM touched)),
        |organic AS (
        | SELECT pid, cents, -1 AS campaign, 1000000 AS credit FROM p
        | WHERE NOT EXISTS (SELECT 1 FROM touched t WHERE t.pid = p.pid)),
        |allc AS (SELECT * FROM split UNION ALL SELECT * FROM organic)
        |SELECT campaign, CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
        | CAST(sum(credit) AS BIGINT) AS credit_micro,
        | CAST(sum(cents::HUGEINT * credit) AS VARCHAR) AS rev_micro_cents
        |FROM allc GROUP BY campaign ORDER BY campaign""".stripMargin,
    // A-before-B from per-(user, type) time spans only — linear mining
    "q216_seq_rules" ->
      """WITH spans AS (
        | SELECT user_id, event_type AS et,
        |  min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        | FROM events GROUP BY 1, 2),
        |pairs AS (
        | SELECT a.et AS ante, b.et AS cons,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS support
        | FROM spans a JOIN spans b ON a.user_id = b.user_id
        |  AND a.et <> b.et AND a.lo < b.hi
        | GROUP BY 1, 2),
        |ant AS (SELECT et AS ante, CAST(count(DISTINCT user_id) AS BIGINT)
        |          AS ante_support
        |        FROM spans GROUP BY 1)
        |SELECT p.ante, p.cons, p.support, a.ante_support,
        | (10000 * p.support) // a.ante_support AS confidence_bp
        |FROM pairs p JOIN ant a USING (ante)
        |ORDER BY support DESC, ante, cons""".stripMargin,
    // same per-candidate grouped distinct + rollup, one UNION ALL branch
    // per candidate FD
    "q180_fd_audit" -> {
      val branches = fdCandidates.map { case (tbl, lhs, rhs) =>
        s"""SELECT '$tbl.$lhs->$rhs' AS fd, count(*) AS n_groups,
           | CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_violating,
           | CAST(sum(CASE WHEN ndv > 1 THEN nrows ELSE 0 END) AS BIGINT)
           |   AS violating_rows,
           | max(ndv) AS max_ndv,
           | sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $lhs, CAST(count(DISTINCT $rhs) AS BIGINT) AS ndv,
           |      CAST(count(*) AS BIGINT) AS nrows
           |      FROM $tbl GROUP BY $lhs)""".stripMargin
      }.mkString("\n UNION ALL\n")
      s"$branches\nORDER BY fd"
    },
    "q162_funnel_curve" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |su AS (SELECT user_id, min(tus) AS t_s FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |cl AS (
        | SELECT e.user_id, min(e.tus) AS t_c, min(su.t_s) AS t_s2
        | FROM e JOIN su ON e.user_id = su.user_id
        | WHERE e.event_type = 'click' AND e.tus >= su.t_s
        |  AND e.tus < su.t_s + 604800000000
        | GROUP BY 1),
        |pu AS (
        | SELECT e.user_id, min(e.tus) AS t_p, min(cl.t_c) AS t_c2
        | FROM e JOIN cl ON e.user_id = cl.user_id
        | WHERE e.event_type = 'purchase' AND e.tus >= cl.t_c
        |  AND e.tus < cl.t_c + 604800000000
        | GROUP BY 1),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS base FROM su),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS base FROM cl),
        |dd AS (SELECT unnest(range(0, 7)) AS day_offset),
        |cc AS (SELECT (t_c - t_s2) // 86400000000 AS day, count(*) AS n
        |       FROM cl GROUP BY 1),
        |cp AS (SELECT (t_p - t_c2) // 86400000000 AS day, count(*) AS n
        |       FROM pu GROUP BY 1),
        |u AS (
        | SELECT 'click' AS stage, dd.day_offset,
        |  CAST(coalesce(cc.n, 0) AS BIGINT) AS n, ns.base
        | FROM dd LEFT JOIN cc ON dd.day_offset = cc.day CROSS JOIN ns
        | UNION ALL
        | SELECT 'purchase', dd.day_offset,
        |  CAST(coalesce(cp.n, 0) AS BIGINT), nc.base
        | FROM dd LEFT JOIN cp ON dd.day_offset = cp.day CROSS JOIN nc),
        |c AS (
        | SELECT stage, day_offset, n,
        |  CAST(sum(n) OVER (PARTITION BY stage ORDER BY day_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_conv, base
        | FROM u)
        |SELECT stage, day_offset, n AS n_conv, cum_conv,
        | CASE WHEN base > 0
        |  THEN CAST(cum_conv AS DOUBLE) / CAST(base AS DOUBLE) END AS cum_rate
        |FROM c ORDER BY stage, day_offset""".stripMargin,
    "q156_session_paths" ->
      """WITH e AS (
        | SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
        | FROM events),
        |t AS (
        | SELECT event_type AS t1,
        |  lead(event_type, 1) OVER w AS t2,
        |  lead(event_type, 2) OVER w AS t3
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |g AS (
        | SELECT t1 || ' > ' || t2 || ' > ' || t3 AS path, count(*) AS n
        | FROM t WHERE t3 IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
        |SELECT path, n, CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM g CROSS JOIN tot
        |ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q155_cusum_changepoint" ->
      """WITH e AS (
        | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events),
        |d AS (SELECT event_type, day, CAST(sum(c) AS BIGINT) AS dc
        |      FROM e GROUP BY 1, 2),
        |w AS (
        | SELECT event_type, day, dc,
        |  CAST(row_number() OVER wo AS BIGINT) AS k,
        |  sum(dc) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
        |  count(*) OVER (PARTITION BY event_type) AS n,
        |  sum(dc) OVER (PARTITION BY event_type) AS tot
        | FROM d WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
        |c AS (
        | SELECT event_type, n, tot, day,
        |  abs(CAST(pre AS HUGEINT) * n - CAST(tot AS HUGEINT) * k) AS cu
        | FROM w),
        |b AS (
        | SELECT event_type, max(struct_pack(cu := cu, nd := -day)) AS best,
        |  max(n) AS n_days, max(tot) AS tot
        | FROM c GROUP BY 1)
        |SELECT event_type, n_days,
        | CAST(tot AS DOUBLE) / 100.0 AS total_value,
        | -(best.nd) AS change_day,
        | CAST(best.cu AS BIGINT) AS cusum_abs,
        | CAST(best.cu AS DOUBLE) / CAST(n_days AS DOUBLE) / 100.0 AS shift_value
        |FROM b ORDER BY event_type""".stripMargin,
    // brute per-user cross of clicks × purchases, argmin by the same
    // (dist, t, −id) struct the two as-of passes realize
    "q152_nearest_event" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
        | FROM events),
        |c AS (SELECT event_id AS click_id, user_id, tus AS click_tus
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS pid, user_id, tus AS ptus
        |      FROM e WHERE event_type = 'purchase'),
        |j AS (SELECT c.click_id, p.pid, p.ptus,
        |       abs(p.ptus - c.click_tus) AS dist
        |      FROM c JOIN p USING (user_id)),
        |best AS (SELECT click_id,
        |  min(struct_pack(d := dist, t := ptus, nid := -pid)) AS b
        | FROM j GROUP BY click_id)
        |SELECT c.click_id, c.user_id, c.click_tus,
        | CAST(-(best.b.nid) AS BIGINT) AS p_id,
        | best.b.t AS p_tus, best.b.d AS dist_us
        |FROM c LEFT JOIN best USING (click_id)
        |ORDER BY c.click_id""".stripMargin,
    "q138_debounce" ->
      """WITH e AS (
        | SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
        | FROM events),
        |f AS (
        | SELECT *, CASE WHEN tus - lag(tus) OVER w <= 300000000
        |   THEN 0 ELSE 1 END AS fresh
        | FROM e WINDOW w AS (PARTITION BY user_id, event_type
        |   ORDER BY tus, event_id)),
        |b AS (
        | SELECT *, sum(fresh) OVER (PARTITION BY user_id, event_type
        |   ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |   AND CURRENT ROW) AS burst
        | FROM f),
        |g AS (
        | SELECT user_id, event_type, burst,
        |  min(struct_pack(t := tus, i := event_id)) AS head,
        |  count(*) AS n_collapsed,
        |  max(tus) - min(tus) AS span_us
        | FROM b GROUP BY 1, 2, 3)
        |SELECT user_id, event_type, head.i AS event_id, head.t AS tus,
        | n_collapsed, span_us
        |FROM g ORDER BY user_id, event_type, tus""".stripMargin,
    "q134_ivm_moments" ->
      """WITH e AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events),
        |g AS (
        | SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS sc,
        |  sum(CAST(c AS HUGEINT) * c) AS s2
        | FROM e GROUP BY 1),
        |q AS (
        | SELECT event_type, n, sc,
        |  CASE WHEN n > 1
        |   THEN CAST((n * s2 - CAST(sc AS HUGEINT) * sc) // (n * (n - 1))
        |     AS BIGINT) END AS var_cents2
        | FROM g)
        |SELECT event_type, n,
        | CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_value,
        | var_cents2,
        | CAST(var_cents2 AS DOUBLE) / 10000.0 AS var_value,
        | sqrt(CAST(var_cents2 AS DOUBLE) / 10000.0) AS stddev_value
        |FROM q ORDER BY event_type""".stripMargin,
    // the sequential-scan statistic restated in the window form: a reset
    // flag per non-increase, runs = cumulative resets, longest = max run
    "q247_secondary_sort" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events),
        |o AS (
        | SELECT user_id, tus, event_id, c,
        |  CASE WHEN c > lag(c) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) THEN 0 ELSE 1 END AS reset
        | FROM e),
        |r AS (
        | SELECT user_id,
        |  CAST(sum(reset) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS run_id
        | FROM o),
        |runs AS (
        | SELECT user_id, run_id, CAST(count(*) AS BIGINT) AS len
        | FROM r GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_events,
        | CAST(max(len) AS BIGINT) AS longest_run
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the accumulator row must equal the exact aggregate — hash equality
    // proves the task-side tallies saw every row exactly once
    // coalesce(·, 0): accumulators START at zero, so the engine's empty-
    // input row is all-zero — the oracle's empty sums must match
    "q248_accumulator_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(coalesce(sum(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END), 0)
        |   AS BIGINT) AS n_rejected,
        | CAST(coalesce(sum(k), 0) AS BIGINT) AS k_sum
        |FROM (SELECT CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT)
        |        AS k FROM events)""".stripMargin,
    // same running-max regression depths over arrival order; the p99
    // cover depth is an exact rank over the depth grid
    "q239_ooo_audit" ->
      """WITH e AS (
        | SELECT event_type, event_id, epoch_us(ts) AS tus FROM events),
        |dep AS (
        | SELECT event_type,
        |  greatest(coalesce(max(tus) OVER (PARTITION BY event_type
        |    ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), tus)
        |    - tus, 0) AS depth
        | FROM e),
        |g AS (
        | SELECT event_type, depth, CAST(count(*) AS BIGINT) AS cnt
        | FROM dep GROUP BY 1, 2),
        |w AS (
        | SELECT event_type, depth, cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY depth
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        | FROM g)
        |SELECT event_type, min(n) AS n_events,
        | CAST(sum(CASE WHEN depth > 0 THEN cnt ELSE 0 END) AS BIGINT)
        |   AS n_late,
        | CAST(sum(CASE WHEN depth > 0 THEN cnt ELSE 0 END) AS BIGINT)
        |   * 10000 // min(n) AS late_bp,
        | max(depth) AS max_depth_us,
        | min(CASE WHEN cum * 100 >= n * 99 THEN depth END) AS p99_depth_us
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q135_late_data_audit" ->
      """WITH e AS (
        | SELECT event_type, event_id, event_id % 8 AS part,
        |  epoch_us(ts) AS tus
        | FROM events),
        |w AS (
        | SELECT event_type,
        |  greatest(coalesce(max(tus) OVER (PARTITION BY part ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - tus, 0), 0)
        |   AS late_us
        | FROM e)
        |SELECT event_type, count(*) AS n,
        | count(CASE WHEN late_us > 60000000 THEN 1 END) AS n_late_1m,
        | count(CASE WHEN late_us > 600000000 THEN 1 END) AS n_late_10m,
        | count(CASE WHEN late_us > 3600000000 THEN 1 END) AS n_late_1h,
        | CAST(max(late_us) AS BIGINT) AS max_late_us
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q133_ewma_smooth" -> {
      val c = (0 until 16).map(k => 1L << (15 - k))
      val lags = (0 until 16)
        .map(k => if (k == 0) "vc AS l0" else s"lag(vc, $k) OVER w AS l$k")
        .mkString(",\n |  ")
      // HUGEINT numerator + cent-quantizing `//` — the engine's
      // DECIMAL(38,0) + decTruncDiv twin (cents·2^15 overflows INT64 on
      // the wide cents grid, and a >2^53 numerator must never reach a
      // double cast: DuckDB's wide-int→double is not correctly rounded)
      val num = (0 until 16)
        .map(k => s"coalesce(l$k::HUGEINT * ${c(k)}, 0)")
        .mkString("\n |   + ")
      val den = (0 until 16)
        .map(k => s"CASE WHEN l$k IS NOT NULL THEN ${c(k)} ELSE 0 END")
        .mkString("\n |   + ")
      s"""WITH e AS (
         | SELECT user_id, event_id, epoch_us(ts) AS tus,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
         | FROM events),
         |l AS (
         | SELECT user_id, event_id, tus, vc,
         |  $lags
         | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
         |SELECT user_id, event_id, tus, CAST(vc AS DOUBLE) / 100.0 AS value,
         | CAST(($num)
         |  // ($den)
         |  AS DOUBLE) / 100.0 AS ewma
         |FROM l ORDER BY user_id, tus, event_id""".stripMargin
    },
    "q130_twap" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc, event_id
        | FROM events),
        |w AS (
        | SELECT user_id, tus, vc,
        |  coalesce(lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |    - tus, 0) AS dur
        | FROM e),
        |g AS (
        | SELECT user_id, count(*) AS n_obs,
        |  max(tus) - min(tus) AS span_us,
        |  sum(CAST(vc AS HUGEINT) * dur) AS wsum
        | FROM w GROUP BY 1)
        |SELECT user_id, n_obs, span_us,
        | CAST(wsum AS DOUBLE) / CAST(span_us * 100 AS DOUBLE) AS twap
        |FROM g WHERE span_us > 0 ORDER BY user_id""".stripMargin,
    "q131_percentile_bands" ->
      """WITH e AS (
        | SELECT event_type, (epoch_us(ts) // 3600000000) AS hour,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        | FROM events)
        |SELECT event_type, hour, count(*) AS n,
        | quantile_cont(vc, 0.5) / 100.0 AS p50,
        | quantile_cont(vc, 0.9375) / 100.0 AS p9375
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q132_basket_lift" ->
      """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
        |u AS (SELECT count(DISTINCT user_id) AS n_users FROM b),
        |s AS (SELECT event_type, count(*) AS n_single FROM b GROUP BY 1),
        |p AS (
        | SELECT a.event_type AS type_a, b2.event_type AS type_b,
        |  count(*) AS n_ab
        | FROM b a JOIN b b2 ON a.user_id = b2.user_id
        |  AND a.event_type < b2.event_type
        | GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n_single AS n_a, sb.n_single AS n_b, n_ab,
        | CAST(n_ab AS DOUBLE) / CAST(u.n_users AS DOUBLE) AS support,
        | CAST(CAST(n_ab AS HUGEINT) * u.n_users AS DOUBLE)
        |  / CAST(CAST(sa.n_single AS HUGEINT) * sb.n_single AS DOUBLE) AS lift
        |FROM p
        |JOIN s sa ON p.type_a = sa.event_type
        |JOIN s sb ON p.type_b = sb.event_type
        |CROSS JOIN u
        |ORDER BY lift DESC, type_a, type_b""".stripMargin,
    "q124_pit_join" ->
      """WITH o AS (SELECT * FROM orders WHERE o_custkey % 20 = 1),
        |h0 AS (
        | SELECT o_custkey AS custkey, CAST(o_orderdate AS TIMESTAMP) AS pit_ts,
        |  max(struct_pack(k := o_orderkey, p := o_totalprice)) AS eff
        | FROM o GROUP BY 1, 2),
        |h AS (
        | SELECT custkey, pit_ts, eff.p AS state_price,
        |  CAST(row_number() OVER (PARTITION BY custkey ORDER BY pit_ts) AS BIGINT) AS version
        | FROM h0),
        |f AS (
        | SELECT o.o_custkey AS custkey, CAST(l.l_shipdate AS TIMESTAMP) AS pit_ts,
        |  CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
        |  CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        | FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey),
        |j AS (
        | SELECT f.custkey, f.qc, f.pc, h.version, h.state_price
        | FROM f ASOF JOIN h ON f.custkey = h.custkey AND f.pit_ts >= h.pit_ts)
        |SELECT custkey, version, max(state_price) AS state_price,
        | count(*) AS n_items,
        | CAST(CAST(sum(qc) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty,
        | CAST(CAST(sum(pc) AS BIGINT) AS DOUBLE) / 100.0 AS revenue
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q123_linear_gapfill" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
        |  epoch_us(ts) // 3600000000 AS hour_id
        | FROM events WHERE user_id < 8),
        |h AS (
        | SELECT user_id, hour_id, count(*) AS n_events,
        |  max(struct_pack(tus := tus, event_id := event_id, vc := vc)) AS le
        | FROM e GROUP BY 1, 2),
        |hh AS (SELECT user_id, hour_id, n_events, le.vc AS vc FROM h),
        |span AS (SELECT user_id, min(hour_id) AS h0, max(hour_id) AS h1
        |  FROM e GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hour_id FROM span),
        |cells AS (
        | SELECT g.user_id, g.hour_id, hh.n_events, hh.vc,
        |  CASE WHEN hh.vc IS NOT NULL
        |   THEN struct_pack(h := g.hour_id, v := hh.vc) END AS obs
        | FROM grid g LEFT JOIN hh
        |   ON g.user_id = hh.user_id AND g.hour_id = hh.hour_id),
        |f AS (
        | SELECT user_id, hour_id, n_events, vc,
        |  last_value(obs IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hour_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
        |  first_value(obs IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hour_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next
        | FROM cells)
        |SELECT user_id, hour_id, coalesce(n_events, 0) AS n_events,
        | vc IS NOT NULL AS is_observed,
        | CAST(CASE WHEN vc IS NOT NULL THEN vc::HUGEINT * 1000000
        |  ELSE prev.v::HUGEINT * 1000000
        |   + ((next.v::HUGEINT - prev.v) * (hour_id - prev.h) * 1000000)
        |     // (next.h - prev.h)
        |  END AS DOUBLE) / 100000000.0 AS value_interp
        |FROM f ORDER BY user_id, hour_id""".stripMargin,
    "q122_cohort_ltv" ->
      """WITH ev AS (
        | SELECT user_id, event_type, epoch_us(ts) // 604800000000 AS week,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cw FROM ev GROUP BY 1),
        |mw AS (SELECT max(week) AS mw FROM ev),
        |rev AS (
        | SELECT c2.cw, e.week - c2.cw AS ws, CAST(sum(e.c) AS BIGINT) AS rc
        | FROM ev e JOIN cohorts c2 USING (user_id)
        | WHERE e.event_type = 'purchase' GROUP BY 1, 2),
        |sizes AS (SELECT cw, count(*) AS n_users FROM cohorts GROUP BY 1),
        |grid AS (
        | SELECT s2.cw, s2.n_users, g.ws
        | FROM sizes s2 CROSS JOIN mw,
        |  LATERAL (SELECT unnest(range(0, CAST(mw.mw - s2.cw + 1 AS BIGINT))) AS ws) g),
        |cells AS (
        | SELECT grid.cw AS cohort_week, grid.ws AS weeks_since, grid.n_users,
        |  coalesce(rev.rc, 0) AS rc
        | FROM grid LEFT JOIN rev ON grid.cw = rev.cw AND grid.ws = rev.ws)
        |SELECT cohort_week, weeks_since, n_users,
        | CAST(rc AS DOUBLE) / 100.0 AS week_revenue,
        | CAST(CAST(sum(rc) OVER (PARTITION BY cohort_week ORDER BY weeks_since
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE) / 100.0 AS cum_revenue,
        | CAST(CAST(sum(rc) OVER (PARTITION BY cohort_week ORDER BY weeks_since
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
        |   / (100.0 * CAST(n_users AS DOUBLE)) AS ltv_per_user
        |FROM cells ORDER BY cohort_week, weeks_since""".stripMargin,
    "q120_last_touch" ->
      """WITH c AS (
        | SELECT user_id, epoch_us(ts) AS tus, epoch_us(ts) AS click_tus,
        |  CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INT) AS campaign
        | FROM events WHERE event_type = 'click'),
        |p AS (
        | SELECT user_id, epoch_us(ts) AS tus,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM events WHERE event_type = 'purchase'),
        |j AS (
        | SELECT p.cents, p.tus, c.click_tus, c.campaign
        | FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.tus >= c.tus)
        |SELECT CASE WHEN click_tus IS NOT NULL AND tus - click_tus <= 3600000000
        |   AND campaign IS NOT NULL
        |  THEN campaign ELSE -1 END AS campaign,
        | count(*) AS n_purchases,
        | CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS sum_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q117_ivm_agg" ->
      """WITH ev AS (
        | SELECT event_type, epoch_us(ts) AS tus,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events)
        |SELECT event_type,
        | count(*) FILTER (tus < epoch_us(TIMESTAMP '2024-01-21 00:00:00')
        |   OR tus IS NULL) AS n_base,
        | count(*) FILTER (tus >= epoch_us(TIMESTAMP '2024-01-21 00:00:00')) AS n_delta,
        | count(*) AS n_total,
        | CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_value
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    // the full join + FILTER decomposition must equal the engine's
    // base ⊕ delta refresh — revenue rounded ONCE from the exact decimal
    "q165_ivm_join" ->
      """WITH j AS (
        | SELECT o_orderpriority,
        |  coalesce(l_shipdate >= TIMESTAMP '2000-06-01 00:00:00', false) AS l_new,
        |  coalesce(o_orderdate >= TIMESTAMP '2000-06-01 00:00:00', false) AS o_new,
        |  CAST(l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l_discount AS DECIMAL(12,4)) AS rev
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority,
        | count(*) FILTER (NOT l_new AND NOT o_new) AS n_base,
        | count(*) FILTER (l_new OR o_new) AS n_delta,
        | count(*) AS n_total,
        | CAST(round(coalesce(sum(rev) FILTER (l_new OR o_new), 0), 2) AS DOUBLE)
        |   AS rev_delta,
        | CAST(round(sum(rev), 2) AS DOUBLE) AS revenue
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q119_wow_movers" ->
      """WITH wk AS (
        | SELECT event_type, epoch_us(ts) // 604800000000 AS week,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sc
        | FROM events GROUP BY 1, 2),
        |x AS (
        | SELECT event_type, week, sc,
        |  lag(week) OVER (PARTITION BY event_type ORDER BY week) AS pw,
        |  lag(sc) OVER (PARTITION BY event_type ORDER BY week) AS psc
        | FROM wk)
        |SELECT event_type, week, CAST(sc AS DOUBLE) / 100.0 AS sum_value,
        | CAST(psc AS DOUBLE) / 100.0 AS prev_value,
        | CAST(sc - psc AS DOUBLE) / 100.0 AS delta
        |FROM x WHERE pw = week - 1
        |ORDER BY abs(sc - psc) DESC, event_type, week LIMIT 15""".stripMargin,
    "q114_integrity_audit" ->
      """WITH x AS (
        | SELECT '1_lineitem_orphan_orderkey' AS check_name,
        |  (SELECT count(*) FROM lineitem) AS n_total,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
        | UNION ALL
        | SELECT '2_orders_orphan_custkey',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        | UNION ALL
        | SELECT '3_events_dup_event_id',
        |  (SELECT count(*) FROM events),
        |  (SELECT count(*) - count(DISTINCT event_id) FROM events)
        | UNION ALL
        | SELECT '4_events_nonpositive_value',
        |  (SELECT count(*) FROM events),
        |  (SELECT count(*) FILTER (value <= 0) FROM events)
        | UNION ALL
        | SELECT '5_documents_blank_text',
        |  (SELECT count(*) FROM documents),
        |  (SELECT count(*) FILTER (text IS NULL OR trim(text) = '') FROM documents))
        |SELECT check_name, n_total, n_violations,
        | CAST(n_violations AS DOUBLE) / CAST(n_total AS DOUBLE) AS violation_rate
        |FROM x ORDER BY check_name""".stripMargin,
    "q106_snapshot_diff" ->
      """WITH base AS (
        | SELECT o_orderkey AS okey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |  o_orderpriority
        | FROM orders),
        |v0 AS (SELECT okey, price AS old_price FROM base WHERE okey % 7 <> 0),
        |v1 AS (
        | SELECT okey,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |       THEN CAST(price + CAST(1.00 AS DECIMAL(18,2)) AS DECIMAL(18,2))
        |       ELSE price END AS new_price
        | FROM base WHERE okey % 11 <> 0),
        |d AS (
        | SELECT coalesce(v0.okey, v1.okey) AS okey, old_price, new_price,
        |  CASE WHEN old_price IS NULL THEN 'insert'
        |       WHEN new_price IS NULL THEN 'delete'
        |       WHEN old_price <> new_price THEN 'update' END AS change_type
        | FROM v0 FULL OUTER JOIN v1 ON v0.okey = v1.okey)
        |SELECT okey, change_type, CAST(old_price AS DOUBLE) AS old_price,
        | CAST(new_price AS DOUBLE) AS new_price FROM d
        |WHERE change_type IS NOT NULL ORDER BY okey""".stripMargin,
    "q107_event_transitions" ->
      """WITH e AS (
        | SELECT user_id, event_type, event_id, epoch_us(ts) AS tus FROM events),
        |st AS (
        | SELECT user_id, event_type,
        |  lag(event_type) OVER w AS prev_type,
        |  tus, lag(tus) OVER w AS prev_tus
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |cnt AS (
        | SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
        | FROM st
        | WHERE prev_type IS NOT NULL AND tus - prev_tus <= 1800000000
        | GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_n
        |  FROM cnt GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        | CAST(c.n AS DOUBLE) / CAST(t.from_n AS DOUBLE) AS p
        |FROM cnt c JOIN tot t USING (from_type)
        |ORDER BY c.from_type, c.to_type""".stripMargin,
    "q98_open_intervals" ->
      """WITH iv AS (
        | SELECT o_orderdate AS start_day, l_shipdate AS end_day
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_shipdate > o_orderdate),
        |d AS (
        | SELECT start_day AS day, 1 AS dd FROM iv
        | UNION ALL
        | SELECT end_day, -1 FROM iv),
        |byday AS (SELECT day, CAST(sum(dd) AS BIGINT) AS net FROM d GROUP BY day)
        |SELECT CAST(day AS TIMESTAMP) AS day, net,
        | CAST(sum(net) OVER (ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_cnt
        |FROM byday ORDER BY day""".stripMargin,
    // brute force: every observed day range-joined against the presence
    // set — the quadratic spelling the engine's sweep-line plan avoids
    "q142_rolling_actives" ->
      """WITH p AS (
        | SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        | FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM p GROUP BY day),
        |wau AS (
        | SELECT d.day, count(DISTINCT p.user_id) AS wau7
        | FROM dau d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
        | GROUP BY d.day)
        |SELECT day, dau, wau7 FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,
    "q95_resample_ffill" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id, value,
        |  epoch_us(ts) // 3600000000 AS hour_id
        | FROM events WHERE user_id < 8),
        |h AS (
        | SELECT user_id, hour_id, count(*) AS n_events,
        |  max(struct_pack(tus := tus, event_id := event_id, value := value)) AS le
        | FROM e GROUP BY 1, 2),
        |hh AS (SELECT user_id, hour_id, n_events, le.value AS last_in_hour FROM h),
        |span AS (SELECT user_id, min(hour_id) AS h0, max(hour_id) AS h1
        |  FROM e GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hour_id FROM span)
        |SELECT g.user_id, g.hour_id,
        | coalesce(hh.n_events, 0) AS n_events, hh.last_in_hour,
        | last_value(hh.last_in_hour IGNORE NULLS) OVER (
        |   PARTITION BY g.user_id ORDER BY g.hour_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
        |FROM grid g LEFT JOIN hh
        |  ON g.user_id = hh.user_id AND g.hour_id = hh.hour_id
        |ORDER BY g.user_id, g.hour_id""".stripMargin,
    "q93_scd2_history" ->
      """WITH o AS (SELECT * FROM orders WHERE o_custkey % 20 = 1)
        |SELECT o_custkey AS custkey, o_orderkey AS order_key,
        | CAST(o_orderdate AS TIMESTAMP) AS valid_from,
        | o_totalprice AS totalprice,
        | CAST(row_number() OVER w AS BIGINT) AS version,
        | lead(CAST(o_orderdate AS TIMESTAMP), 1) OVER w AS valid_to,
        | (lead(o_orderdate, 1) OVER w IS NULL) AS is_current
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY custkey, version""".stripMargin,
    "q73_merge_upsert" ->
      """WITH base AS (
        | SELECT c_custkey AS custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        | FROM customer WHERE c_custkey < 1200),
        |delta AS (
        | SELECT o_custkey AS custkey,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS delta_bal,
        |  count(*) AS n_orders
        | FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        | GROUP BY o_custkey)
        |SELECT coalesce(b.custkey, d.custkey) AS custkey,
        | CASE WHEN b.custkey IS NOT NULL AND d.custkey IS NOT NULL THEN 'update'
        |      WHEN b.custkey IS NULL THEN 'insert' ELSE 'keep' END AS action,
        | CAST(coalesce(b.acctbal, 0) AS DOUBLE) AS old_bal,
        | CAST(coalesce(b.acctbal, 0) + coalesce(d.delta_bal, 0) AS DOUBLE) AS new_bal,
        | coalesce(d.n_orders, 0) AS n_orders
        |FROM base b FULL OUTER JOIN delta d ON b.custkey = d.custkey
        |ORDER BY custkey""".stripMargin,
    "q80_latest_per_key" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tus
        | FROM events),
        |m AS (
        | SELECT user_id, max(struct_pack(tus := tus, event_id := event_id,
        |   event_type := event_type, value := value)) AS le
        | FROM e GROUP BY user_id)
        |SELECT user_id, le.event_id AS last_event_id,
        | le.event_type AS last_type, le.value AS last_value,
        | le.tus AS last_tus
        |FROM m ORDER BY user_id""".stripMargin,
    "q81_event_funnel" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |su AS (
        | SELECT user_id, min(tus) AS t_s FROM e
        | WHERE event_type = 'signup' GROUP BY user_id),
        |cl AS (
        | SELECT e.user_id, min(e.tus) AS t_c, min(su.t_s) AS t_s2
        | FROM e JOIN su ON e.user_id = su.user_id
        | WHERE e.event_type = 'click' AND e.tus >= su.t_s
        | GROUP BY e.user_id),
        |pu AS (
        | SELECT e.user_id, min(e.tus) AS t_p, min(cl.t_c) AS t_c2
        | FROM e JOIN cl ON e.user_id = cl.user_id
        | WHERE e.event_type = 'purchase' AND e.tus >= cl.t_c
        | GROUP BY e.user_id)
        |SELECT
        | (SELECT count(DISTINCT user_id) FROM e) AS n_users,
        | (SELECT count(*) FROM su) AS n_signup,
        | (SELECT count(*) FROM cl) AS n_click,
        | (SELECT count(*) FROM pu) AS n_purchase,
        | (SELECT (CAST(sum(t_c - t_s2) AS DOUBLE) / count(*)) / 3600000000.0
        |    FROM cl) AS avg_h_signup_to_click,
        | (SELECT (CAST(sum(t_p - t_c2) AS DOUBLE) / count(*)) / 3600000000.0
        |    FROM pu) AS avg_h_click_to_purchase""".stripMargin,
    "q82_retention_cohorts" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS week FROM events),
        |c AS (
        | SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
        | count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q75_bloom_join" ->
      """SELECT l.l_returnflag, count(*) AS n_items,
        | CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin)
}
