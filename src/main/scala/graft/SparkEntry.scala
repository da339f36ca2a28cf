package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{DedupOps, EtlOps, GraphOps, LayoutOps, MultimodalOps, Relational, SimilarityOps, StatsOps, TextOps, TpchOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 is a named query below; the
  * matching ANSI SQL in `oracleSql` runs on DuckDB over the same parquet
  * tables (keys without SQL get the driver's rows-only check — those are the
  * ones whose hash family, xxhash64, DuckDB doesn't have).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      GraphOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      StatsOps.queries ++ EtlOps.queries ++ LayoutOps.queries ++
      TpchOps.queries ++
      Map(
        "q76_stream_static_join" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q76StreamStaticJoin(s, d)),
        "q79_stream_merge" ->
          ((s: SparkSession, d: String) => graft.streaming.IngestStream.q79StreamMerge(s, d)),
        "q55_stream_hourly" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q55StreamHourly(s, d)),
        "q87_stream_hopping" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q87StreamHopping(s, d)),
        "q60_stream_sessionize" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q60StreamSessionize(s, d)),
        "q63_stream_interval_join" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q63StreamIntervalJoin(s, d)),
        "q158_stream_left_join" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q158StreamLeftJoin(s, d)),
        "q71_stream_dedup" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q71StreamDedup(s, d)),
        "q108_stream_transitions" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q108StreamTransitions(s, d)),
        "q137_stream_ewma" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q137StreamEwma(s, d)),
        "q154_stream_hitters" ->
          ((s: SparkSession, d: String) => graft.streaming.DocsStream.q154StreamHitters(s, d)),
        "q164_stream_cascade" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q164StreamCascade(s, d)),
        "q176_stream_debounce" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q176StreamDebounce(s, d)),
        "q187_stream_session_window" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q187StreamSessionWindow(s, d)),
        "q193_stream_full_outer_join" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q193StreamFullOuterJoin(s, d)),
        "q199_stream_countmin" ->
          ((s: SparkSession, d: String) => graft.streaming.DocsStream.q199StreamCountMin(s, d)),
        "q202_stream_cusum" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q202StreamCusum(s, d)),
        "q214_stream_asof_enrich" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q214StreamAsofEnrich(s, d)),
        "q225_stream_kmv" ->
          ((s: SparkSession, d: String) => graft.streaming.DocsStream.q225StreamKmv(s, d)),
        "q245_stream_quantile_grid" ->
          ((s: SparkSession, d: String) => graft.streaming.DocsStream.q245StreamQuantileGrid(s, d)),
        "q246_stream_topk" ->
          ((s: SparkSession, d: String) => graft.streaming.DocsStream.q246StreamTopK(s, d)),
        "q250_stream_timer_sessions" ->
          ((s: SparkSession, d: String) => graft.streaming.EventsStream.q250StreamTimerSessions(s, d)),
        "q251_stream_daily_map" ->
          ((s: SparkSession, d: String) => graft.streaming.DocsStream.q251StreamDailyMap(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ DedupOps.oracle ++
      GraphOps.oracle ++ SimilarityOps.oracle ++ MultimodalOps.oracle ++
      StatsOps.oracle ++ EtlOps.oracle ++ LayoutOps.oracle ++
      TpchOps.oracle ++
      // streaming twins of q23/q28: same semantics, so literally the same
      // oracle strings — the stream must produce the batch answer
      Map(
        // stream-static enrichment must equal the batch join aggregate
        "q76_stream_static_join" ->
          """SELECT c.c_mktsegment AS segment, e.event_type,
            | count(*) AS n_events,
            | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            |FROM events e JOIN customer c ON e.user_id = c.c_custkey
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
        // the streaming CDC apply folds batch-by-batch to the same state
        // as the one-shot merge — same oracle as q73 by construction
        "q79_stream_merge" -> EtlOps.oracle("q73_merge_upsert"),
        // the built-in session_window at gap+1us is the same session
        // predicate as q28's lag formulation — same oracle by construction
        "q83_session_window" -> Relational.oracle("q28_sessionize"),
        "q55_stream_hourly" -> Relational.oracle("q23_events_hourly"),
        // the hopping stream must land on the batch hopping answer
        "q87_stream_hopping" -> Relational.oracle("q86_hopping_window"),
        "q60_stream_sessionize" -> Relational.oracle("q28_sessionize"),
        // the stateful buffered-replay stream must land on the batch
        // transition matrix — same oracle as q107 by construction
        "q108_stream_transitions" -> EtlOps.oracle("q107_event_transitions"),
        // the buffered-replay streaming smoother is arithmetic-identical
        // to the batch lag-window form — same oracle as q133
        "q137_stream_ewma" -> EtlOps.oracle("q133_ewma_smooth"),
        // the streamed Misra-Gries candidates feed q110's exact recount
        // verbatim — the stream twin must land on the batch answer
        "q154_stream_hitters" -> StatsOps.oracle("q110_heavy_hitters"),
        // the stream-stream interval join must equal the batch interval join
        "q63_stream_interval_join" ->
          """WITH e AS (SELECT event_id, user_id, event_type, value,
            |  epoch_us(ts) AS tus FROM events),
            |c AS (SELECT event_id AS click_id, user_id, tus FROM e
            |  WHERE event_type = 'click'),
            |p AS (SELECT user_id, tus, CAST(value AS DECIMAL(18,2)) AS v FROM e
            |  WHERE event_type = 'purchase')
            |SELECT c.click_id, count(*) AS n_purch_1h,
            | CAST(sum(p.v) AS DOUBLE) AS sum_purch_value
            |FROM c JOIN p ON c.user_id = p.user_id
            |  AND p.tus >= c.tus - 3600000000 AND p.tus <= c.tus
            |GROUP BY c.click_id ORDER BY click_id""".stripMargin,
        // the LEFT OUTER stream join must equal the batch left join:
        // unmatched clicks emit on watermark eviction with 0 / NULL
        "q158_stream_left_join" ->
          """WITH e AS (SELECT event_id, user_id, event_type, value,
            |  epoch_us(ts) AS tus FROM events),
            |c AS (SELECT event_id AS click_id, user_id, tus FROM e
            |  WHERE event_type = 'click'),
            |p AS (SELECT user_id, tus, CAST(value AS DECIMAL(18,2)) AS v FROM e
            |  WHERE event_type = 'purchase')
            |SELECT c.click_id, count(p.user_id) AS n_purch_1h,
            | CAST(sum(p.v) AS DOUBLE) AS sum_purch_value
            |FROM c LEFT JOIN p ON c.user_id = p.user_id
            |  AND p.tus >= c.tus - 3600000000 AND p.tus <= c.tus
            |GROUP BY c.click_id ORDER BY click_id""".stripMargin,
        // streaming dedup must make the double delivery invisible: the
        // oracle is the per-type aggregate over the table ingested ONCE
        "q71_stream_dedup" ->
          """SELECT event_type, count(*) AS n_events,
            | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
        // the chained hourly→6h streaming cascade must land on the batch
        // 6h rollup: tumbling starts are epoch-aligned integer-µs math
        "q164_stream_cascade" ->
          """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
            |  AS win_start,
            | event_type, count(*) AS n_events,
            | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
        // the stateful burst collapse must land on the batch window form —
        // same oracle as q138 by construction
        "q176_stream_debounce" -> EtlOps.oracle("q138_debounce"),
        // the built-in session_window STREAM must land on the same session
        // set as the lag formulation — same oracle as q28/q83
        "q187_stream_session_window" -> Relational.oracle("q28_sessionize"),
        // the FULL OUTER stream join = the batch LEFT JOIN aggregate plus
        // one row per purchase with no click in its mirrored window
        "q193_stream_full_outer_join" ->
          """WITH e AS (SELECT event_id, user_id, event_type, value,
            |  epoch_us(ts) AS tus FROM events),
            |c AS (SELECT event_id AS click_id, user_id, tus FROM e
            |  WHERE event_type = 'click'),
            |p AS (SELECT event_id AS p_id, user_id, tus,
            |  CAST(value AS DECIMAL(18,2)) AS v FROM e
            |  WHERE event_type = 'purchase')
            |SELECT 'click' AS side, c.click_id AS id,
            | count(p.user_id) AS n_purch_1h,
            | CAST(sum(p.v) AS DOUBLE) AS sum_value
            |FROM c LEFT JOIN p ON c.user_id = p.user_id
            |  AND p.tus >= c.tus - 3600000000 AND p.tus <= c.tus
            |GROUP BY c.click_id
            |UNION ALL
            |SELECT 'orphan_purchase' AS side, p.p_id AS id,
            | 0 AS n_purch_1h, CAST(p.v AS DOUBLE) AS sum_value
            |FROM p WHERE NOT EXISTS (SELECT 1 FROM c
            |  WHERE c.user_id = p.user_id
            |    AND c.tus >= p.tus AND c.tus <= p.tus + 3600000000)
            |ORDER BY side, id""".stripMargin,
        // additive counters merge across micro-batches exactly as across
        // partitions — the stream twin shares q190's counter-grid fragment
        "q199_stream_countmin" ->
          s"""WITH ${StatsOps.duckCmCounters}
             |SELECT j, CAST(bucket AS BIGINT) AS bucket,
             | CAST(cnt AS BIGINT) AS cnt
             |FROM counters ORDER BY j, bucket""".stripMargin,
        // the stateful stream evaluates q155's n-scaled argmax exactly —
        // same oracle as the batch window form by construction
        "q202_stream_cusum" -> EtlOps.oracle("q155_cusum_changepoint"),
        // the stream-static as-of enrichment must equal the batch
        // interval join over the same daily version intervals
        "q214_stream_asof_enrich" ->
          """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
            |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            | FROM events),
            |fd AS (SELECT user_id, tus // 86400000000 AS day,
            |  min(struct_pack(tus := tus, event_id := event_id, c := c)) AS f
            | FROM ev GROUP BY 1, 2),
            |vers AS (SELECT user_id, day, f.tus AS eff_from, f.c AS state_c,
            |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
            |    AS BIGINT) AS version,
            |  coalesce(lead(f.tus) OVER (PARTITION BY user_id ORDER BY day),
            |    9223372036854775807) AS eff_to
            | FROM fd),
            |j AS (SELECT e.user_id, v.version, v.state_c, e.c
            | FROM ev e JOIN vers v ON e.user_id = v.user_id
            |  AND e.tus >= v.eff_from AND e.tus < v.eff_to)
            |SELECT user_id, version,
            | CAST(max(state_c) AS DOUBLE) / 100.0 AS state_value,
            | CAST(count(*) AS BIGINT) AS n_events,
            | CAST(sum(c) AS DOUBLE) / 100.0 AS sum_value
            |FROM j GROUP BY user_id, version
            |ORDER BY user_id, version""".stripMargin,
        // identical fold machine + identical drain as q60 ⇒ the timer
        // formulation must land on the same session set as the batch form
        "q250_stream_timer_sessions" -> Relational.oracle("q28_sessionize"),
        // daily map cells are additive: micro-batch merge ≡ partition
        // merge ⇒ the drained MapState equals the batch daily rollup
        "q251_stream_daily_map" ->
          """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            | CAST(count(*) AS BIGINT) AS n_events,
            | CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            |   AS BIGINT) AS sum_cents
            |FROM events GROUP BY 1, 2
            |ORDER BY event_type, day""".stripMargin,
        // top-k sets merge by union + re-take-k across micro-batches, so
        // the drained ListState equals the batch window top-k exactly
        "q246_stream_topk" ->
          """WITH e AS (
            | SELECT event_type, event_id,
            |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            | FROM events),
            |r AS (
            | SELECT event_type, event_id, c,
            |  CAST(row_number() OVER (PARTITION BY event_type
            |    ORDER BY c DESC, event_id) AS INT) AS rk
            | FROM e)
            |SELECT event_type, rk, event_id, c FROM r WHERE rk <= 5
            |ORDER BY event_type, rk""".stripMargin,
        // additive value-grid counters merge across micro-batches exactly
        // as across partitions — the streamed dictionary must equal the
        // batch build, so the twin shares q236's oracle by construction
        "q245_stream_quantile_grid" ->
          graft.ops.StatsOps.oracle("q236_quantile_normalize"),
        // the min-k set folds across micro-batches exactly as across
        // partitions (union + re-take-k), so the streamed sketch must
        // land on q141's batch sketch; m replaces n_distinct (bounded
        // state cannot count distincts — but m < k implies m IS the
        // distinct count, which is also when the estimator reports it)
        "q225_stream_kmv" ->
          """WITH h AS (
            | SELECT lang,
            |  md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))
            |    AS h
            | FROM documents),
            |dh AS (SELECT DISTINCT lang, h FROM h WHERE h IS NOT NULL),
            |mink AS (
            | SELECT lang, h,
            |  row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
            | FROM dh),
            |sk AS (SELECT lang, CAST(count(*) AS BIGINT) AS m, max(h) AS kth
            |  FROM mink WHERE rn <= 64 GROUP BY lang),
            |stats AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            |  FROM h GROUP BY lang),
            |j AS (
            | SELECT s.lang, s.n_docs, k.m, substr(k.kth, 1, 8) AS kth_prefix,
            |  (strpos('0123456789abcdef', substr(k.kth, 1, 1)) - 1) * 268435456
            |  + (strpos('0123456789abcdef', substr(k.kth, 2, 1)) - 1) * 16777216
            |  + (strpos('0123456789abcdef', substr(k.kth, 3, 1)) - 1) * 1048576
            |  + (strpos('0123456789abcdef', substr(k.kth, 4, 1)) - 1) * 65536
            |  + (strpos('0123456789abcdef', substr(k.kth, 5, 1)) - 1) * 4096
            |  + (strpos('0123456789abcdef', substr(k.kth, 6, 1)) - 1) * 256
            |  + (strpos('0123456789abcdef', substr(k.kth, 7, 1)) - 1) * 16
            |  + (strpos('0123456789abcdef', substr(k.kth, 8, 1)) - 1) AS u32
            | FROM stats s JOIN sk k USING (lang))
            |SELECT lang, n_docs, m, kth_prefix,
            | CAST(CASE WHEN m < 64 THEN m
            |      ELSE 270582939648 // greatest(u32, 1) END AS BIGINT)
            |   AS est_distinct
            |FROM j ORDER BY lang""".stripMargin)
}
