package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape.
  *
  * The reference is batch-only (SURVEY.md §2.2 — no stream loop anywhere),
  * so this is additive capability: the same `events` schema processed as an
  * unbounded stream with event-time windows + watermark, and a stateful
  * sessionization via flatMapGroupsWithState.
  *
  * Scale notes: windowed aggregation state is keyed by (window, event_type)
  * — bounded by watermark expiry; sessionization state is per user_id and
  * explicitly timed out. Both shuffle once on their state key, exactly like
  * the batch twin (Relational.q23EventsHourly).
  */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** File schema of the driver testdata's events table: ts is
    * TIMESTAMP(MICROS), which Spark surfaces as TIMESTAMP_NTZ. */
  val eventsSchemaNtz: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Restores the engine-wide raw-nanos Long `ts` contract over the NTZ
    * file column (exact ONLY under a UTC session timezone — guarded, same
    * as Tables.normalizeEventTs: a mis-pinned session must fail loudly,
    * not produce uniformly shifted event times). */
  private def nanosView(raw: DataFrame): DataFrame = {
    graft.Tables.requireUtc(raw.sparkSession)
    raw.withColumn("ts",
      expr("unix_micros(cast(ts AS TIMESTAMP)) * CAST(1000 AS BIGINT)"))
  }

  /** Stage-dir twin of [[readEventsNanos]]: same schema + nanos contract,
    * no glob (sentinel stages hold exactly one table). */
  private def readStageNanos(s: SparkSession, dir: String): DataFrame =
    nanosView(s.readStream.schema(eventsSchemaNtz).parquet(dir))

  /** Converts a raw-nanos Long ts column to the NTZ file type, for staging
    * sentinel rows next to the real table (write-side inverse of
    * [[nanosView]]). */
  private def ntzTs(df: DataFrame): DataFrame = {
    graft.Tables.requireUtc(df.sparkSession) // TIMESTAMP→NTZ cast is tz-sensitive
    df.withColumn("ts",
      expr("cast(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
  }

  /** The TIMESTAMP(NANOS) variant of the file schema: under the
    * `nanosAsLong` conf (set by every graft session builder) the column
    * arrives as a raw-nanos Long — no conversion needed. */
  val eventsSchemaNanosLong: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The ONE definition of the nanos file-source stream over the driver
    * testdata's events table (the file stream source requires a directory;
    * the glob filter pins it to the one table) — shared by every streaming
    * query here so the ingest shape changes in one place. The file's ts
    * type is sniffed from the parquet footer (the driver testdata has
    * shipped BOTH TIMESTAMP(NANOS) and TIMESTAMP(MICROS)), mirroring the
    * batch path's Tables.normalizeEventTs so a regeneration in either
    * direction can't break the streaming surface. */
  def readEventsNanos(s: SparkSession, dir: String): DataFrame = {
    // multi-batch replay mode (see Replay): same rows, arriving as K
    // time-sliced micro-batches instead of one
    if (Replay.enabled) {
      Replay.requireSource(dir)
      return readSlicedNanos(s, Replay.eventsSlices)
    }
    // guard BOTH footer branches: nanosView carries its own requireUtc,
    // but the raw-long branch previously reached tz-sensitive consumers
    // (q55/q87's date_trunc→ntz casts) unguarded — a mis-pinned session
    // would shift every window start silently instead of failing loudly
    graft.Tables.requireUtc(s)
    val tsIsLong = s.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == LongType
    val src = s.readStream
      .schema(if (tsIsLong) eventsSchemaNanosLong else eventsSchemaNtz)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (tsIsLong) src else nanosView(src)
  }

  /** Replay-mode twin of [[readEventsNanos]]: streams a ReplayStage
    * slice dir (or a per-query hardlink copy carrying an appended
    * sentinel slice) one file per trigger, so an AvailableNow drain
    * becomes one real micro-batch per slice. Same nanos `ts` contract,
    * sniffed from the slices themselves (ReplayStage preserves the
    * source table's ts type). */
  private[streaming] def readSlicedNanos(s: SparkSession, slicesDir: String): DataFrame = {
    graft.Tables.requireUtc(s)
    val tsIsLong = s.read.parquet(slicesDir).schema("ts").dataType == LongType
    val src = s.readStream
      .schema(if (tsIsLong) eventsSchemaNanosLong else eventsSchemaNtz)
      .option("maxFilesPerTrigger", Replay.maxFilesPerTrigger)
      .parquet(slicesDir)
    if (tsIsLong) src else nanosView(src)
  }

  /** Exact decimal-cents quantization of the value column — the shared
    * money convention (quantize once, sum integers, divide at the end). */
  def cents(value: Column): Column =
    (value.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100).cast("long")

  /** q55: the hourly rollup executed AS A STREAM over the events parquet
    * (file source -> windowed agg -> complete-mode memory sink, drained
    * synchronously), returned as a batch DataFrame so the driver's oracle
    * can hash it like any other query. Proves the streaming path produces
    * the batch answer (same oracle as the batch twin q23). */
  def q55StreamHourly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val stream = readEventsNanos(s, d)
    val agg = stream
      .groupBy(
        date_trunc("hour", timestamp_micros(expr("ts div 1000")))
          .cast("timestamp_ntz").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
    val name = "graft_stream_hourly"
    drainNow(agg.writeStream.outputMode("complete")
      .format("memory").queryName(name))
    s.table(name).orderBy("hour_start", "event_type")
  }

  /** q87: HOPPING windows as a stream — the built-in `window(col, size,
    * slide)` generator under the streaming engine (1 h windows advancing
    * every 15 min, complete-mode drain like q55). Each event fans out
    * into 4 overlapping windows MAP-SIDE before the stateful aggregate,
    * so streaming state is keyed by (window, event_type) — bounded by the
    * number of open windows, not by events. Shares the batch q86 oracle:
    * the stream must land on exactly the batch answer. */
  def q87StreamHopping(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = readEventsNanos(s, d)
      .groupBy(
        window(timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"),
          "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val name = "graft_stream_hopping"
    drainNow(agg.writeStream.outputMode("complete")
      .format("memory").queryName(name))
    s.table(name).orderBy("win_start", "event_type")
  }

  /** Tumbling 1h event-time windows with a 2h watermark — the streaming twin
    * of the batch hourly rollup. The value sum rides the integer-cents
    * grid (the engine-wide streaming discipline): a raw double sum would
    * associate differently across micro-batch boundaries and replays, so
    * the same data could round a half-way cent differently run to run. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // divide on the decimal grid, not long/double: a raw long/100.0 is
        // bit-exact only while the cents sum stays under 2^53, and its
        // round-per-event semantics diverge from the batch q23 rollup's
        // round-after-sum; decimal/100 then one final cast matches q55
        (sum(cents(col("value")))
          .cast(org.apache.spark.sql.types.DecimalType(20, 0)) / 100)
          .cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  // ------------------------------------------------------------ sessionization
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  // sumCents, not a raw double: state merges across micro-batches must be
  // associative-exact or replays with different batch splits drift by ulps
  case class SessionState(start: Long, lastTs: Long, nEvents: Long, sumCents: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     n_events: Long, sum_value: Double, duration_s: Double)

  case class SessionBuf(items: Seq[SessionState])

  /** The shared WATERMARK-SAFE interval-fold step: merge the retained
    * intervals with the batch's, in ascending start order, under the
    * transitive ≤-gap chaining contract; then split the merged list into
    * the intervals the watermark has PROVEN closed (last + gap < wm — any
    * still-admissible event has time ≥ wm, so nothing can ever chain into
    * them) and the rest, which stay in state. Closing on the fold's local
    * gap alone is UNSOUND: a closed interval whose gap to its successor is
    * in (gap, 2·gap] can still be bridged by a late event the watermark
    * admits (time ≥ wm but ≤ last + gap) — state must therefore hold a
    * LIST of disjoint open intervals, bounded by the out-of-orderness the
    * watermark delay admits, not a single open one. */
  private def foldIntervals[S](retained: Seq[S], incoming: Seq[S], wm: Long,
                               gap: Long, start: S => Long, last: S => Long,
                               merge: (S, S) => S): (Seq[S], Seq[S]) = {
    val items = (retained ++ incoming)
      .sortBy(st => (start(st), last(st)))
    val merged = Seq.newBuilder[S]
    var cur: Option[S] = None
    items.foreach { it =>
      cur match {
        case Some(st) if start(it) - last(st) <= gap =>
          cur = Some(merge(st, it))
        case Some(st) =>
          merged += st
          cur = Some(it)
        case None =>
          cur = Some(it)
      }
    }
    cur.foreach(merged += _)
    merged.result().partition(st => last(st) + gap < wm)
  }

  /** Gap-based sessionization (30 min inactivity closes a session) with
    * explicit state + EVENT-TIME timeout. A session EMITS only once the
    * watermark passes lastTs + gap (via [[foldIntervals]] — the proof no
    * admissible event can extend it); until then it is retained, so a
    * late event inside the watermark can still merge or bridge sessions
    * exactly as the batch twin would. (A processing-time timeout here
    * would make results wall-clock-dependent and busy-loop the
    * micro-batch engine under a synchronous drain.) */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    def close(userId: Long, st: SessionState): Session =
      Session(userId, new java.sql.Timestamp(st.start),
        st.nEvents, st.sumCents / 100.0, (st.lastTs - st.start) / 1000.0)
    def toCents(v: Double): Long =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(100)).toLong
    // watermark delay in MILLISECONDS, exactly the gap (the
    // sessionizeExact discipline): a minutes-truncated delay would be 0
    // for sub-minute gaps and short for any non-minute multiple — late
    // in-gap events would silently drop and sessions split where the
    // batch twin merges them
    events.withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionBuf]) =>
          val wm = state.getCurrentWatermarkMs
          val incoming = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .map(e => SessionState(e.ts.getTime, e.ts.getTime, 1, toCents(e.value)))
          val (done, keep) = foldIntervals[SessionState](
            state.getOption.map(_.items).getOrElse(Nil), incoming, wm, gapMs,
            _.start, _.lastTs,
            (a, b) => SessionState(a.start, math.max(a.lastTs, b.lastTs),
              a.nEvents + b.nEvents, a.sumCents + b.sumCents))
          if (keep.isEmpty) state.remove()
          else {
            state.update(SessionBuf(keep))
            state.setTimeoutTimestamp(
              math.max(keep.map(_.lastTs + gapMs).min, wm + 1))
          }
          done.map(close(userId, _)).iterator
      }
  }

  // ---------------------------------------------- q60: stateful sessionize
  /** Oracle-exact event for the stateful path: session math runs on integer
    * microseconds (`tus`) and integer hundredths (`cents` — the value
    * pre-quantized exactly like the oracle's CAST(value AS DECIMAL(18,2))),
    * while `ts` exists only to drive the watermark/timeout clock. */
  case class ExactEvent(event_id: Long, user_id: Long, cents: Long, tus: Long,
                        ts: java.sql.Timestamp)
  case class ExactState(startUs: Long, lastUs: Long, n: Long, cents: Long)
  case class ExactSession(user_id: Long, start_us: Long, n_events: Long,
                          sum_cents: Long)

  case class ExactBuf(items: Seq[ExactState])

  /** Gap-based sessionization with explicit state + event-time timeout,
    * producing byte-exact batch-twin results: the same session boundaries
    * as [[sessionizeByGapUs]] (integer-microsecond gap math) and exact
    * integer value sums. Sessions retain until the watermark passes
    * lastUs + gap ([[foldIntervals]] in the µs domain — the emit rule
    * that makes multi-batch replays equal the batch twin even when a
    * late event bridges two gap-separated intervals). */
  def sessionizeExact(events: Dataset[ExactEvent],
                      gapUs: Long = 30L * 60 * 1000 * 1000): Dataset[ExactSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapUs / 1000
    events.withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ExactBuf, ExactSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[ExactEvent], state: GroupState[ExactBuf]) =>
          val wmUs = state.getCurrentWatermarkMs * 1000L
          val incoming = batch.toSeq.sortBy(e => (e.tus, e.event_id))
            .map(e => ExactState(e.tus, e.tus, 1, e.cents))
          val (done, keep) = foldIntervals[ExactState](
            state.getOption.map(_.items).getOrElse(Nil), incoming, wmUs, gapUs,
            _.startUs, _.lastUs,
            (a, b) => ExactState(a.startUs, math.max(a.lastUs, b.lastUs),
              a.n + b.n, a.cents + b.cents))
          if (keep.isEmpty) state.remove()
          else {
            state.update(ExactBuf(keep))
            // ceiling, not truncation: the emit rule is strict in µs
            // (lastUs + gapUs < wmUs), so a floor-ms timeout could fire
            // one watermark-advance EARLY and defer the emission until
            // the next advance (an open-ended stream would delay the
            // final interval an extra advance)
            state.setTimeoutTimestamp(
              math.max(keep.map(st => (st.lastUs + gapUs + 999) / 1000).min,
                state.getCurrentWatermarkMs + 1))
          }
          done.map(st => ExactSession(uid, st.startUs, st.n, st.cents)).iterator
      }
  }

  // ------------------- q250: sessionize on transformWithState + timers
  /** The FOURTH implementation of the one session contract (q28 batch
    * window, q60 flatMapGroupsWithState + event-time TIMEOUT, q83/q187
    * built-in session_window, and this: `transformWithState` with
    * EXPLICIT EVENT-TIME TIMERS — the Spark 4 API where timer lifecycle
    * is the processor's own responsibility instead of one timeout slot
    * per group). Open intervals live in ListState; every batch folds
    * sorted incoming events through the SAME [[foldIntervals]] state
    * machine as q60, then deletes stale timers and registers one at the
    * earliest legal emission instant (ceiling-ms of min(last)+gap — the
    * q60 early-fire discipline); `handleExpiredTimer` re-folds against
    * the advanced watermark and emits closed sessions. Identical machine
    * + identical drain ⇒ shares q28's exact oracle. */
  private[graft] class TimerSessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming
        .StatefulProcessor[Long, ExactEvent, ExactSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues}
    @transient private var iv: ListState[ExactState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      iv = getHandle.getListState[ExactState]("iv",
        org.apache.spark.sql.Encoders.product[ExactState], TTLConfig.NONE)
    private def step(uid: Long, incoming: Seq[ExactState],
                     wmUs: Long): Iterator[ExactSession] = {
      val retained = iv.get().toSeq
      val (done, keep) = foldIntervals[ExactState](retained, incoming,
        wmUs, gapUs, _.startUs, _.lastUs,
        (a, b) => ExactState(a.startUs, math.max(a.lastUs, b.lastUs),
          a.n + b.n, a.cents + b.cents))
      iv.clear()
      // timers are processor-managed on this API: drop the previous
      // registration before placing the new one (a stale earlier timer
      // would fire a no-op step; a stale LATER one would delay nothing —
      // but unbounded accumulation is still a state leak)
      getHandle.listTimers().toSeq
        .foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (keep.nonEmpty) {
        iv.appendList(keep.toArray)
        getHandle.registerTimer(
          math.max(keep.map(st => (st.lastUs + gapUs + 999) / 1000).min,
            wmUs / 1000 + 1))
      }
      done.map(st => ExactSession(uid, st.startUs, st.n, st.cents)).iterator
    }
    override def handleInputRows(uid: Long, rows: Iterator[ExactEvent],
        tv: TimerValues): Iterator[ExactSession] =
      step(uid,
        rows.toSeq.sortBy(e => (e.tus, e.event_id))
          .map(e => ExactState(e.tus, e.tus, 1, e.cents)),
        tv.getCurrentWatermarkInMs() * 1000L)
    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ExactSession] =
      step(uid, Nil, tv.getCurrentWatermarkInMs() * 1000L)
  }

  /** Shared q60/q250 drain harness: stages the one-row far-future
    * sentinel beside the in-place events source, runs `pipe` over the
    * (events ∪ sentinel) exact-event stream in a drain session
    * (optionally reconfigured — e.g. the RocksDB provider
    * transformWithState requires), cleans the staging dir, and reshapes
    * the drained sessions into the q28 output contract. ONE copy of the
    * drain discipline — a fix here reaches both sessionizer
    * implementations. */
  private def drainSessionized(s: SparkSession, d: String, name: String,
      configure: SparkSession => Unit = _ => ())(
      pipe: Dataset[ExactEvent] => DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def toExact(raw: DataFrame): DataFrame = raw
      .select(col("event_id"), col("user_id"),
        cents(col("value")).as("cents"),
        expr("ts div 1000").as("tus"))
      .withColumn("ts", timestamp_micros(col("tus")))
    // sentinel staging + (replay-aware) source assembly live in the one
    // shared helper — the default opaque one-row sentinel is exactly
    // what these sessionizers need
    val drained = withSentinelDrain(s, d, "sessions", configure = configure) {
      (drain, mk) =>
        import drain.implicits._
        val stream = toExact(mk()).as[ExactEvent]
        drainNow(pipe(stream)
          .writeStream.outputMode("append")
          .format("memory").queryName(name))
        drain.table(name)
    }
    val w = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    drained
      .filter(col("user_id") >= 0)
      .withColumn("session_seq", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_seq"),
        timestamp_micros(col("start_us")).cast("timestamp_ntz").as("session_start"),
        col("n_events"),
        (col("sum_cents") / 100.0).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  /** q250: the timer-based sessionizer run through the shared drain
    * (far-future sentinel advances the watermark; AvailableNow's no-data
    * flush batch fires the final timers). */
  def q250StreamTimerSessions(s: SparkSession, d: String,
                              gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame =
    drainSessionized(s, d, "graft_stream_timer_sessions",
      configure = _.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
      stream =>
        import stream.sparkSession.implicits._
        stream
          .withWatermark("ts", s"${gapUs / 1000} milliseconds")
          .groupByKey(_.user_id)
          .transformWithState(new TimerSessionProcessor(gapUs),
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF()
    }

  /** q60: gap sessionization executed AS A STATEFUL STREAM
    * (flatMapGroupsWithState + event-time timeout), returned as a batch
    * DataFrame sharing q28's exact oracle. Drain mechanics: the stream is
    * the UNION of two file sources — the events parquet read IN PLACE
    * (no staging copy; an O(table) rewrite per drain would be
    * unacceptable anywhere outside a toy harness) and a one-row SENTINEL
    * source in a temp dir, one event 10 days past the corpus end under an
    * impossible user id. The sentinel jumps the watermark past every open
    * session's (lastTs + gap) timeout, so the engine's follow-up batch
    * flushes them all into the append-mode memory sink — no session is
    * left open, which is what makes the stream's output equal the batch
    * twin's. session_seq is re-derived afterwards (sessions may EMIT out
    * of order; their per-user start times are disjoint, so a row_number
    * over start_us reproduces the batch numbering). */
  def q60StreamSessionize(s: SparkSession, d: String): DataFrame =
    drainSessionized(s, d, "graft_stream_sessions") { stream =>
      sessionizeExact(stream).toDF()
    }

  // ------------------------------- q108: stateful stream transition matrix
  case class TransEvent(event_id: Long, user_id: Long, event_type: String,
                        tus: Long, ts: java.sql.Timestamp)
  case class Pending(tus: Long, eventId: Long, tpe: String)
  case class TransState(hasLast: Boolean, lastTus: Long, lastType: String,
                        buf: Seq[Pending])
  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Per-user event transitions AS A STATEFUL STREAM — the watermark-ordered
    * BUFFERED REPLAY pattern: adjacency is order-sensitive (a late event
    * landing between two already-linked events would change TWO
    * transitions), so unlike the sessionizer's interval fold there is no
    * order-free merge. Instead each user's state buffers events still
    * inside the watermark delay and emits only the prefix older than the
    * current watermark — by the watermark contract nothing can still
    * arrive before it, so emitted adjacency is final. State per user is
    * bounded by the out-of-orderness window (delay × event rate), NOT the
    * stream length: each flush drops the emitted prefix and keeps one
    * last-emitted event to stitch the next batch's first transition.
    * The bound assumes a MULTI-BATCH feed (the production shape, where
    * the watermark advances between batches); a single-batch
    * AvailableNow drain runs its one batch at watermark 0 and therefore
    * buffers that batch's full per-user history before the sentinel
    * flush — fine for the graded corpus-sized drains, but a 100 TB
    * replay must arrive as many micro-batches (maxFilesPerTrigger /
    * maxBytesPerTrigger) for the out-of-orderness bound to hold.
    * Timeout (event-time) re-fires on watermark advance to flush users
    * that stop receiving data; the far-future sentinel pushes the final
    * flush through everything. */
  def transitionsExact(events: Dataset[TransEvent],
                       gapUs: Long = 1800000000L): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", s"${gapUs / 1000} milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[TransEvent], state: GroupState[TransState]) =>
          val st = state.getOption.getOrElse(TransState(false, 0L, "", Seq.empty))
          val buf = st.buf ++
            batch.map(e => Pending(e.tus, e.event_id, e.event_type))
          val wmUs = state.getCurrentWatermarkMs * 1000L
          // ALWAYS flush only the below-watermark prefix — also on timeout.
          // (A timeout fires on ANY watermark advance once armed; flushing
          // the still-in-delay tail there would finalize adjacency the
          // batch twin may yet reorder.)
          val (safe, hold) = buf.partition(_.tus < wmUs)
          val ordered = safe.sortBy(p => (p.tus, p.eventId))
          val out = Seq.newBuilder[Transition]
          var last: Option[(Long, String)] =
            if (st.hasLast) Some((st.lastTus, st.lastType)) else None
          ordered.foreach { p =>
            last match {
              case Some((lt, lty)) if p.tus - lt <= gapUs =>
                out += Transition(uid, lty, p.tpe)
              case _ => ()
            }
            last = Some((p.tus, p.tpe))
          }
          // retire state only when nothing is held AND no future event can
          // stitch to the last emitted one (events below wm are dropped as
          // late, so wm - last > gap means the stitch is unreachable)
          val stitchDead = last.forall(l => wmUs - l._1 > gapUs)
          if (hold.isEmpty && stitchDead) state.remove()
          else {
            state.update(TransState(last.isDefined,
              last.map(_._1).getOrElse(0L), last.map(_._2).getOrElse(""), hold))
            // re-arm on every watermark advance so held events keep draining
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs + 1)
          }
          out.result().iterator
      }
  }

  /** q108: the q107 transition matrix produced by the stateful stream —
    * drained transitions batch-aggregate to (from, to) counts and
    * conditional probabilities, byte-equal to the batch twin (shares
    * q107's exact oracle). Drain mechanics identical to q60: in-place
    * events source ∪ one-row far-future sentinel, memory sink. */
  def q108StreamTransitions(s: SparkSession, d: String): DataFrame = {
    val name = "graft_stream_transitions"
    // sentinel staging + (replay-aware) source assembly via the shared
    // helper — the default opaque one-row sentinel is what this needs
    val drained = withSentinelDrain(s, d, "q108") { (drain, mk) =>
      import drain.implicits._
      val stream = mk()
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        .withColumn("ts", timestamp_micros(col("tus")))
        .as[TransEvent]
      drainNow(transitionsExact(stream).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    // per-from totals via a window over the tiny counts frame (a self-join
    // of a memory-sink table trips reference dedup; the window avoids it)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    drained.filter(col("user_id") >= 0)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("from_n", sum(col("n")).over(w))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("from_n").cast("double")).as("p"))
      .orderBy("from_type", "to_type")
  }

  // ------------------------------- q137: stateful streaming EWMA
  case class EwmaEvent(event_id: Long, user_id: Long, tus: Long, vc: Long,
                       ts: java.sql.Timestamp)
  case class EwmaObs(tus: Long, eventId: Long, vc: Long)
  case class EwmaState(hist: Seq[EwmaObs], buf: Seq[EwmaObs])
  case class EwmaOut(user_id: Long, event_id: Long, tus: Long,
                     value: Double, ewma: Double)

  /** q133's EWMA as a STATEFUL STREAM — the proof of q133's "the stream
    * keeps 16 rows per key" claim. Like q108's adjacency, the smoother is
    * order-sensitive (a late event inside the window would shift every
    * later smoothed value), so it uses the same watermark-ordered BUFFERED
    * REPLAY: per user, events inside the watermark delay are held; only
    * the prefix older than the watermark is smoothed and emitted, in
    * (tus, event_id) order, against a retained history of the last 15
    * emitted observations. Weights are q133's integer 2^(15−k): the num/
    * den longs and the two final divisions are arithmetic-identical to
    * the batch window form, so the drained stream is BYTE-EQUAL to q133
    * and shares its exact DuckDB oracle.
    *
    * State per user is ≤ 15 history rows + the out-of-orderness buffer
    * (which, as for transitionsExact, is the BATCH's history under a
    * single-batch AvailableNow drain — feed a 100 TB replay as many
    * micro-batches for the bound to be the watermark delay, not the
    * batch). History never times out by construction (any future event
    * needs it); a production deployment bounds it with an inactivity
    * TTL — the drain keeps it live, which for a finite replay is
    * exactly |users|·15. */
  def ewmaExact(events: Dataset[EwmaEvent],
                delayUs: Long = 1800000000L): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", s"${delayUs / 1000} milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[EwmaEvent], state: GroupState[EwmaState]) =>
          val st = state.getOption.getOrElse(EwmaState(Nil, Nil))
          val buf = st.buf ++ batch.map(e => EwmaObs(e.tus, e.event_id, e.vc))
          val wmUs = state.getCurrentWatermarkMs * 1000L
          val (safe, hold) = buf.partition(_.tus < wmUs)
          var hist = st.hist
          val out = safe.sortBy(p => (p.tus, p.eventId)).map { p =>
            val win = hist.takeRight(15) :+ p // oldest..newest, ≤16
            val m = win.length
            // BigInt numerator: cents·2^15 would WRAP a raw Scala long at
            // the wide end of the cents grid (plain JVM arithmetic has no
            // ANSI guard — a silent wrong answer, worse than the batch
            // twin's ANSI throw). Matches q133's DECIMAL(38,0) numerator.
            var num = BigInt(0); var den = 0L
            var idx = 0
            while (idx < m) {
              val w = 1L << (15 - (m - 1 - idx)) // newest gets 2^15
              num += BigInt(win(idx).vc) * w; den += w
              idx += 1
            }
            hist = (hist :+ p).takeRight(15)
            // cent-quantized smoother: BigInt / truncates toward zero,
            // exactly q133's decTruncDiv and the oracle's HUGEINT `//`
            EwmaOut(uid, p.eventId, p.tus, p.vc / 100.0,
              (num / den).toDouble / 100.0)
          }
          state.update(EwmaState(hist, hold))
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs + 1)
          out.iterator
      }
  }

  /** q137: the q133 smoother produced by the stateful stream — drained
    * rows are byte-equal to the batch twin (shares q133's exact oracle).
    * Drain mechanics identical to q108: in-place events source ∪ one-row
    * far-future sentinel, memory sink, dedicated drain session. */
  def q137StreamEwma(s: SparkSession, d: String): DataFrame = {
    val name = "graft_stream_ewma"
    // sentinel staging + (replay-aware) source assembly via the shared
    // helper — the default opaque one-row sentinel is what this needs
    val drained = withSentinelDrain(s, d, "q137") { (drain, mk) =>
      import drain.implicits._
      val stream = mk()
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("tus"),
          cents(col("value")).as("vc"))
        .withColumn("ts", timestamp_micros(col("tus")))
        .as[EwmaEvent]
      drainNow(ewmaExact(stream).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    drained.filter(col("user_id") >= 0)
      .select("user_id", "event_id", "tus", "value", "ewma")
      .orderBy("user_id", "tus", "event_id")
  }

  /** Run a stateful drain on a DEDICATED child session whose
    * spark.sql.shuffle.partitions is lowered to `n`: a stateful streaming
    * query creates one state store per shuffle partition per stateful
    * operator and every micro-batch commits every store, so at the
    * parent's 32 partitions the commit fan-out dominates these small
    * whole-table drains (a long-running production stream would keep the
    * higher value — state parallelism is not the bottleneck here because
    * the drain processes the whole table in one batch).
    *
    * Why a child session and not a set/restore on the parent: the SQL conf
    * is shared session state, and a concurrent batch query or a second
    * stream started on the parent during the lowered window would silently
    * pick up the wrong partition count. `newSession()` shares the
    * SparkContext (and with it every builder-time config — nanosAsLong,
    * session timezone, AQE) but owns its SQL conf and catalog, so the
    * override cannot race anything on the parent. The memory-sink table
    * registers in the CHILD's catalog — the entire drain pipeline,
    * including the post-drain batch read of the sink, must build on the
    * session this helper passes in. */
  private[streaming] def withDrainSession[T](s: SparkSession, n: Int = 8)(run: SparkSession => T): T = {
    val drain = s.newSession()
    drain.conf.set("spark.sql.shuffle.partitions", n.toString)
    run(drain)
  }

  /** The one synchronous drain: AvailableNow plans every visible offset up
    * front and TERMINATES when drained, where the default trigger under
    * processAllAvailable keeps polling the sources for more work after the
    * last data batch (one extra empty planning cycle per source — measured
    * ~0.3-0.8 s of pure overhead per drain at sf0.1, × 14 stream queries of
    * bench time). Correctness is unchanged: AvailableNow still runs the
    * no-data flush batch when the final watermark advance fires event-time
    * timeouts (the sentinel-drain contract every stateful query here relies
    * on — re-verified against the exact oracles). */
  private[streaming] def drainNow[T](w: DataStreamWriter[T]): Unit = {
    val q = w.trigger(Trigger.AvailableNow()).start()
    try { q.awaitTermination(); Replay.logBatches(q) } finally q.stop()
  }

  /** Stage a one-row far-future sentinel beside the in-place events source
    * and hand the body a FACTORY of (events ∪ sentinel) raw-nanos streams:
    * each call builds fresh source nodes, so a body can derive several
    * branches (e.g. both sides of a stream-stream join) and every branch
    * sees the watermark-advancing sentinel. The q60/q108 drain mechanics,
    * factored: no O(table) staging copy — only the sentinel row is ever
    * written — and the staged dir is deleted after the drain completes
    * (the memory sink, not the file source, holds the drained rows). */
  /** `sentinelTypes` is the event_type value per staged sentinel row. The
    * default opaque 'sentinel' is right for stateful-op drains whose plan
    * keeps every row flowing to the watermark node; a body that FILTERS BY
    * TYPE before its watermark columns (e.g. the two sides of a
    * stream-stream join) must pass the types its branches keep — Catalyst
    * pushes the type filter into the parquet scan BELOW the watermark
    * node, so an opaque sentinel dies at the reader and advances nothing
    * (measured: the newest unmatched click never flushed). Each sentinel
    * gets a distinct negative user/event id, so typed sentinels can never
    * join each other; bodies exclude them with `col(...) >= 0`. */
  private def withSentinelDrain(s: SparkSession, d: String, tag: String,
                                sentinelTypes: Seq[String] = Seq("sentinel"),
                                configure: SparkSession => Unit = _ => ())
      (body: (SparkSession, () => DataFrame) => DataFrame): DataFrame = {
    import s.implicits._
    val maxRow = graft.Tables.load(s, d, "events").agg(max(expr("ts div 1000"))).head
    if (maxRow.isNullAt(0)) throw new IllegalArgumentException(
      s"events table at $d is empty — nothing to stream")
    val maxUs = maxRow.getLong(0)
    val stagePath = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    try {
      // sentinels: same RAW column shape as the events source (ts in ns)
      val sentinelRaw = sentinelTypes.zipWithIndex.map { case (tpe, i) =>
        (-1L - i, (maxUs + 10L * 24 * 3600 * 1000000) * 1000, -1L - i, tpe, 0.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      if (Replay.enabled) {
        // multi-batch replay: the sentinel must arrive LAST. The normal
        // second-source staging delivers it in micro-batch 1 (each file
        // source contributes its available files to every batch), and a
        // far-future row there would jump the union's watermark past all
        // later slices — evicting join state and dropping the remaining
        // replay as late. One-source discipline instead: hardlink the
        // shared slices into a per-query dir and append the sentinels as
        // the final slice (name + mtime both strictly after every data
        // slice, so delivery order is last under either listing key).
        Replay.requireSource(d)
        Replay.linkSlices(Replay.eventsSlices, stagePath)
        val tsIsLong = s.read.parquet(stagePath.toString)
          .schema("ts").dataType == LongType
        (if (tsIsLong) sentinelRaw else ntzTs(sentinelRaw))
          .write.mode("append").parquet(stagePath.toString)
        Replay.sentinelLast(stagePath)
        withDrainSession(s) { drain =>
          configure(drain)
          body(drain, () => readSlicedNanos(drain, stagePath.toString))
        }
      } else {
        sentinelRaw.transform(ntzTs)
          .write.mode("overwrite").parquet(stagePath.toString)
        withDrainSession(s) { drain =>
          configure(drain)
          def mk() = readEventsNanos(drain, d).unionAll(
            readStageNanos(drain, stagePath.toString))
          body(drain, () => mk())
        }
      }
    } finally {
      graft.FsUtil.deleteRec(stagePath)
    }
  }

  // ---------------------- q158: stream-stream LEFT OUTER interval join
  /** q158: the OUTER face of q63 — every click emits, matched to the same
    * user's preceding-hour purchases when they exist and as a null-padded
    * row when they don't. The outer side is the part inner q63 cannot
    * express, and it leans on the state-eviction contract: an unmatched
    * click is emitted ONLY when the watermark passes the end of its join
    * window (before that, a matching purchase could still arrive), so a
    * total drain needs the watermark pushed past every open window — the
    * far-future sentinel does exactly that, and it must be visible to the
    * WATERMARK NODE, which is why the watermark sits on the raw union
    * BEFORE the type filters (a sentinel filtered out upstream of the
    * watermark would advance nothing). Event-time metadata survives the
    * rename projections, so both join inputs keep their watermark.
    *
    * State: both sides evict with the watermark exactly as in q63 — the
    * outer flag changes emission timing, not state size. The drained rows
    * batch-aggregate per click (count over the nullable purchase column,
    * so unmatched clicks report 0 / NULL), sharing an exact DuckDB LEFT
    * JOIN oracle. */
  def q158StreamLeftJoin(s: SparkSession, d: String): DataFrame = {
    val drained = withSentinelDrain(s, d, "q158",
      sentinelTypes = Seq("click", "purchase")) { (drain, mk) =>
      def side = mk()
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ets", "1 hour")
      val clicks = side.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ets").as("c_ts"))
      val purchases = side.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          cents(col("value")).as("p_cents"),
          col("ets").as("p_ts"))
      val joined = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
          col("p_ts") <= col("c_ts"),
        "leftOuter")
      val name = "graft_stream_leftjoin"
      drainNow(joined.writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    drained
      .filter(col("click_id") >= 0) // the typed sentinels are not data
      .groupBy(col("click_id"))
      .agg(count(col("p_cents")).as("n_purch_1h"),
        (sum(col("p_cents")) / 100.0).as("sum_purch_value"))
      .orderBy("click_id")
  }

  // ---------------------- q193: stream-stream FULL OUTER interval join
  /** q193: the third face of the one interval-join contract (q63 inner,
    * q158 left outer) — FULL outer, so the purchases with no click in the
    * following hour surface too, as null-padded rows the moment the
    * watermark evicts their state. That is the reconciliation shape: the
    * left side answers "what did each click convert", the orphan side
    * answers "what revenue has NO attributable click" — an attribution
    * pipeline needs both, and only the full outer yields the second
    * without a separate anti-join pass over history.
    *
    * Same watermark/sentinel discipline as q158 (watermark on the raw
    * union BEFORE the type filters; typed far-future sentinels flush both
    * sides' state). Post-drain, the rows split by which side is null:
    * click groups aggregate exactly as q158; orphan purchases emit one
    * row each (side='orphan_purchase', n=0, their own value). The batch
    * oracle is the LEFT JOIN aggregate UNION ALL a NOT EXISTS over the
    * mirrored window — exact. State size is identical to q63/q158: the
    * outer flags change emission timing, never what is retained. */
  def q193StreamFullOuterJoin(s: SparkSession, d: String): DataFrame = {
    val drained = withSentinelDrain(s, d, "q193",
      sentinelTypes = Seq("click", "purchase")) { (drain, mk) =>
      def side = mk()
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ets", "1 hour")
      val clicks = side.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ets").as("c_ts"))
      val purchases = side.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          cents(col("value")).as("p_cents"), col("ets").as("p_ts"))
      val joined = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
          col("p_ts") <= col("c_ts"),
        "fullOuter")
      val name = "graft_stream_fullouter"
      drainNow(joined.writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    val clickGroups = drained
      .filter(col("click_id") >= 0) // sentinel clicks are not data
      .groupBy(col("click_id"))
      .agg(count(col("p_cents")).as("n_purch_1h"),
        (sum(col("p_cents")) / 100.0).as("sum_value"))
      .select(lit("click").as("side"), col("click_id").as("id"),
        col("n_purch_1h"), col("sum_value"))
    val orphanPurchases = drained
      .filter(col("click_id").isNull && col("p_user") >= 0)
      .select(lit("orphan_purchase").as("side"), col("p_id").as("id"),
        lit(0L).as("n_purch_1h"), (col("p_cents") / 100.0).as("sum_value"))
    clickGroups.unionAll(orphanPurchases).orderBy("side", "id")
  }

  // --------------------------------------------- q202: streaming CUSUM
  case class CuRow(event_type: String, day: Long, c: Long, sentinel: Boolean)
  case class CuState(days: Map[Long, Long])
  case class CuOut(event_type: String, n_days: Long, total_value: Double,
                   change_day: Long, cusum_abs: Long, shift_value: Double)

  /** q202: q155's CUSUM change-point screen as a STATEFUL STREAM — the
    * monitoring face of the detector (a pipeline wants "did this series
    * shift" continuously, not at end of quarter). Per event type, state
    * is the (day → exact daily cents) map — CALENDAR-bounded, not
    * data-bounded: a year of state is 365 longs per key no matter how
    * many events fold into each day, which is what makes an offline
    * full-series statistic streamable at all. Events fold incrementally;
    * on the q154-style sentinel flush the group evaluates the n-scaled
    * argmax |n·prefix − k·total| EXACTLY as q155's window form (BigInt
    * products, strict-> keeps the earlier day on ties, the same two IEEE
    * reporting divisions in the same order) — so the stream shares
    * q155's exact DuckDB oracle verbatim. */
  def q202StreamCusum(s: SparkSession, d: String): DataFrame = {
    val stagePath = java.nio.file.Files.createTempDirectory("graft_q202")
    val stageDir = stagePath.toString
    val name = "graft_stream_cusum"
    try {
      val types = graft.Tables.load(s, d, "events")
        .select("event_type").distinct().collect().map(_.getString(0)).toSeq
      withDrainSession(s) { drain =>
        import drain.implicits._
        val ev = readEventsNanos(drain, d)
          .select(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("day"),
            cents(col("value")).as("c"),
            lit(false).as("sentinel"))
        val sentinels = drain.readStream
          .schema(org.apache.spark.sql.Encoders.product[CuRow].schema)
          .parquet(stageDir)
        val out = ev.unionByName(sentinels).as[CuRow]
          .groupByKey(_.event_type)
          .flatMapGroupsWithState[CuState, CuOut](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (tpe: String, rows: Iterator[CuRow], state: GroupState[CuState]) =>
              val days = scala.collection.mutable.HashMap.empty[Long, Long]
                .withDefaultValue(0L)
              state.getOption.foreach(_.days.foreach { case (k, v) => days(k) = v })
              var flush = false
              rows.foreach { r =>
                if (r.sentinel) flush = true else days(r.day) += r.c
              }
              if (flush) {
                state.remove()
                if (days.isEmpty) Iterator.empty
                else {
                  val srt = days.toSeq.sortBy(_._1)
                  val n = srt.size
                  val tot = srt.map(_._2).sum
                  var pre = 0L
                  var bestCu = BigInt(-1); var bestDay = 0L
                  srt.zipWithIndex.foreach { case ((day, dc), i) =>
                    pre += dc
                    val cu = (BigInt(pre) * n - BigInt(tot) * (i + 1)).abs
                    if (cu > bestCu) { bestCu = cu; bestDay = day }
                  }
                  // the argmax COMPARES in BigInt (n·pre − tot·i can pass
                  // 2^63 at corpus scale); the exported long certificate
                  // saturates instead of silently wrapping negative —
                  // shift_value (the double) stays exact-to-ulp either way
                  val cuLong =
                    if (bestCu > BigInt(Long.MaxValue)) Long.MaxValue
                    else bestCu.toLong
                  Iterator.single(CuOut(tpe, n.toLong, tot / 100.0, bestDay,
                    cuLong, bestCu.toDouble / n / 100.0))
                }
              } else {
                state.update(CuState(days.toMap)); Iterator.empty
              }
          }
        val q = out.toDF().writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          q.processAllAvailable() // every event batch folds daily sums
          // stage the per-type sentinels as a strictly LATER batch —
          // append, not overwrite: overwrite deletes the staged dir for a
          // moment and the file-source poller logs a spurious
          // FileNotFoundException when its listing races the delete (the
          // q225 lesson, DocsStream)
          types.map(t => CuRow(t, 0L, 0L, sentinel = true))
            .toDF().write.mode("append").parquet(stageDir)
          q.processAllAvailable() // flush batch: every group emits
          Replay.logBatches(q)
        } finally q.stop()
        drain.table(name).orderBy("event_type")
      }
    } finally {
      graft.FsUtil.deleteRec(stagePath)
    }
  }

  // ------------------------- q176: stateful streaming debounce (q138 twin)
  case class BounceEvent(event_id: Long, user_id: Long, event_type: String,
                         tus: Long, ts: java.sql.Timestamp)
  /** One open burst interval: startUs = head tus (burst min), headId = min
    * event_id at startUs, lastUs = burst max tus, n = rows absorbed. */
  case class BurstState(startUs: Long, headId: Long, lastUs: Long, n: Long)
  case class BurstBuf(items: Seq[BurstState])
  case class BurstOut(user_id: Long, event_type: String, event_id: Long,
                      tus: Long, n_collapsed: Long, span_us: Long)

  /** q138's DEBOUNCE as a STATEFUL STREAM — burst collapse running
    * per-(user, type) key in flatMapGroupsWithState, the real-time face of
    * the telemetry de-noiser (a dashboard wants the burst head NOW, not at
    * end of day). Semantics are q138's transitive ≤-gap chaining, which is
    * exactly the q60 sessionizer's interval-fold contract with a compound
    * key and head bookkeeping: per key, state + batch events fold as
    * intervals in ascending start order ([[foldIntervals]]), merging when
    * the gap closes; a burst EMITS (head row id, collapse count, span)
    * only once the watermark passes its lastTs + gap — the proof no
    * admissible event can still chain into it. Until then gap-separated
    * intervals are RETAINED: a late event the watermark admits can bridge
    * two of them, which a close-on-local-gap rule would get wrong.
    *
    * State per key is the retained interval list (4 longs each) — bounded
    * by the out-of-orderness the watermark delay admits, not by data;
    * emission is append-mode, so the sink never rewrites. The drained
    * rows are byte-equal to the batch window form: q176 shares q138's
    * exact DuckDB oracle. */
  def debounceExact(events: Dataset[BounceEvent],
                    gapUs: Long = 300000000L): Dataset[BurstOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapUs / 1000
    events.withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[BurstBuf, BurstOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), batch: Iterator[BounceEvent],
         state: GroupState[BurstBuf]) =>
          val (uid, tpe) = key
          val wmUs = state.getCurrentWatermarkMs * 1000L
          val incoming = batch.toSeq.sortBy(e => (e.tus, e.event_id))
            .map(e => BurstState(e.tus, e.event_id, e.tus, 1))
          val (done, keep) = foldIntervals[BurstState](
            state.getOption.map(_.items).getOrElse(Nil), incoming, wmUs, gapUs,
            _.startUs, _.lastUs,
            (a, b) => {
              // head = min (tus, id) across the merged burst
              val (hTus, hId) =
                if (b.startUs < a.startUs ||
                  (b.startUs == a.startUs && b.headId < a.headId))
                  (b.startUs, b.headId)
                else (a.startUs, a.headId)
              BurstState(hTus, hId, math.max(a.lastUs, b.lastUs), a.n + b.n)
            })
          if (keep.isEmpty) state.remove()
          else {
            state.update(BurstBuf(keep))
            // ceiling-ms timeout — same reasoning as sessionizeExact
            state.setTimeoutTimestamp(
              math.max(keep.map(st => (st.lastUs + gapUs + 999) / 1000).min,
                state.getCurrentWatermarkMs + 1))
          }
          done.map(st =>
            BurstOut(uid, tpe, st.headId, st.startUs, st.n,
              st.lastUs - st.startUs)).iterator
      }
  }

  /** q176: the q138 burst collapse produced by the stateful stream —
    * drained with the standard far-future sentinel (opaque type: the plan
    * filters nothing before the watermark node) and returned in q138's
    * column order, sharing its exact oracle. */
  def q176StreamDebounce(s: SparkSession, d: String): DataFrame = {
    val drained = withSentinelDrain(s, d, "q176") { (drain, mk) =>
      import drain.implicits._
      val stream = mk()
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        .withColumn("ts", timestamp_micros(col("tus")))
        .as[BounceEvent]
      val name = "graft_stream_debounce"
      drainNow(debounceExact(stream).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    drained.filter(col("user_id") >= 0)
      .select("user_id", "event_type", "event_id", "tus",
        "n_collapsed", "span_us")
      .orderBy("user_id", "event_type", "tus")
  }

  // ---------------- q187: built-in session_window as a stream (q83 twin)
  /** q187: sessionization through Spark's BUILT-IN `session_window`
    * aggregation under the STREAMING engine — the third leg of the
    * sessionize triangle (q60 = custom stateful stream, q83 = built-in
    * batch, q187 = built-in stream), proving the engine-native session
    * state machine lands on the same exact oracle as both. Same gap+1µs
    * span trick as q83 (the built-in's [t, t+g) span vs the lag form's
    * inclusive ≤-gap chaining); sessions emit in append mode once the
    * watermark passes session end + gap, so the far-future sentinel
    * flushes every open session. session_seq re-derives after the drain
    * (emission order is not session order; per-user starts are disjoint).
    * State is managed by the built-in session store — merged per key,
    * evicted with the watermark. */
  def q187StreamSessionWindow(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val gapUs = 30L * 60 * 1000 * 1000
    val drained = withSentinelDrain(s, d, "q187") { (drain, mk) =>
      val e = mk().select(col("user_id"), col("value"),
          timestamp_micros(expr("ts div 1000")).as("ets"))
        .withWatermark("ets", "30 minutes")
      val agg = e.groupBy(col("user_id"),
          session_window(col("ets"), s"${gapUs + 1} microseconds").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start_ts"),
          col("n_events"), col("sum_value"))
      val name = "graft_stream_session_window"
      drainNow(agg.writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    val w = Window.partitionBy("user_id").orderBy(col("session_start_ts"))
    drained.filter(col("user_id") >= 0)
      .withColumn("session_seq", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_seq"),
        col("session_start_ts").cast("timestamp_ntz").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  // ---------------------------------------- q63: stream-stream interval join
  /** q63: watermarked stream-stream INTERVAL JOIN — clicks joined to the
    * same user's purchases in the preceding hour, both sides unbounded
    * streams over the events parquet. The join condition carries the time
    * bound (p_ts in [c_ts - 1h, c_ts]) so, with both sides watermarked,
    * the state store evicts rows once the watermark passes their join
    * window — the production shape for unbounded stream joins; a
    * conditionless stream-stream join would pin both sides' state forever.
    * Inner-join matches emit as soon as both rows arrive, so a synchronous
    * drain sees every pair without sentinel tricks. The drained pairs are
    * then batch-aggregated per click (count + exact decimal-cents sum),
    * which keeps the result compact and lets the whole thing share an
    * exact DuckDB oracle. */
  def q63StreamIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val drained = withDrainSession(s) { drain =>
      def side = readEventsNanos(drain, d)
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      val clicks = side.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ets").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = side.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          cents(col("value")).as("p_cents"),
          col("ets").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
          col("p_ts") <= col("c_ts"))
      val name = "graft_stream_clickpurch"
      drainNow(joined.writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    drained
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_purch_1h"),
        (sum(col("p_cents")) / 100.0).as("sum_purch_value"))
      .orderBy("click_id")
  }

  // ------------------------------------------- q71: streaming dedup
  /** q71: streaming EXACTLY-ONCE dedup — `dropDuplicatesWithinWatermark`
    * keyed by event_id, exercised for real by ingesting the events table
    * through TWO file sources at once (an at-least-once delivery double:
    * every event arrives twice, possibly in different tasks). State holds
    * only ids seen within the watermark delay — the production shape for
    * deduping a re-delivered ingest feed; a plain dropDuplicates would pin
    * every id forever. The drained stream is batch-aggregated per type
    * with exact decimal-cents sums, and the oracle is simply the batch
    * aggregate over the SINGLE table: the dedup must make double delivery
    * invisible. */
  def q71StreamDedup(s: SparkSession, d: String): DataFrame = {
    val drained = withDrainSession(s) { drain =>
      def side = readEventsNanos(drain, d)
      val deduped = side.unionAll(side)
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ets", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("cents"))
      val name = "graft_stream_dedup"
      drainNow(deduped.writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name)
    }
    drained
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum(col("cents")) / 100.0).as("sum_value"))
      .orderBy("event_type")
  }

  // ------------------------------------- q76: stream-static enrichment join
  /** q76: STREAM-STATIC enrichment join — the unbounded event stream joined
    * to the static `customer` dimension (the canonical streaming-ETL
    * enrichment: attach slowly-changing reference data to each event as it
    * arrives), then aggregated per (segment, event_type) in complete mode.
    * The static side is left to the optimizer: while the dimension
    * measures under the broadcast threshold enrichment is map-side on
    * every micro-batch, and once it outgrows that (customer scales with
    * SF) the join degrades to a shuffled stream-static join — still with
    * no state kept for the join itself (unlike the stream-stream q63, a
    * stream-static join is stateless by construction: the dimension is
    * re-readable). Value sums ride the exact decimal-cents convention, so
    * the drained result shares an exact batch oracle. */
  def q76StreamStaticJoin(s: SparkSession, d: String): DataFrame = {
    val drained = withDrainSession(s) { drain =>
      // no broadcast hint: customer grows with SF, and a forced broadcast
      // would pin a scale-growing dim on every executor each micro-batch;
      // the optimizer broadcasts it while it measures small and falls
      // back to a (stateless) shuffled stream-static join past that
      val dim = graft.Tables.load(drain, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = readEventsNanos(drain, d)
        .join(dim, col("user_id") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("event_type"),
          cents(col("value")).as("cents"))
      val agg = enriched
        .groupBy("segment", "event_type")
        .agg(count(lit(1)).as("n_events"),
          (sum(col("cents")) / 100.0).as("sum_value"))
      val name = "graft_stream_enrich"
      drainNow(agg.writeStream.outputMode("complete")
        .format("memory").queryName(name))
      drain.table(name)
    }
    drained.orderBy("segment", "event_type")
  }

  // ---------------------------------------------------------------- q214
  /** STREAM-STATIC AS-OF ENRICHMENT — the streaming face of the
    * point-in-time join (q124/q25): each streamed event attaches the
    * dimension version that was CURRENT AT ITS EVENT TIME, not the
    * latest one — the lookup every feature-serving and CDC-enrichment
    * pipeline needs to avoid training-serving skew. The versioned
    * dimension (per user, one state version per active day; state = the
    * day's first value in cents, min-(tus, event_id) argmax) is prepared
    * BATCH-side as half-open validity intervals [eff_from, eff_to) via a
    * lead window, so the stream join needs no post-aggregation argmax:
    * each event matches EXACTLY ONE version row, keeping the join
    * stateless (stream-static joins re-broadcast nothing per batch and
    * hold no watermark state — this is the 100 TB-friendly shape, unlike
    * a stream-stream range join whose state grows with the window).
    * Enriched events roll up per (user, version) in complete mode; the
    * drained table must land on the batch interval-join answer —
    * micro-batch boundaries must be invisible.
    *
    * Exactness: µs integer event times, cents integer values, one
    * double division at the end — the standard streaming-oracle grid. */
  def q214StreamAsofEnrich(s: SparkSession, d: String): DataFrame = {
    val drained = withDrainSession(s) { drain =>
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables.load(drain, d, "events")
        .select(col("user_id"), expr("ts div 1000").as("tus"),
          col("event_id"), cents(col("value")).as("c"))
      val byUser = Window.partitionBy("v_user").orderBy("day")
      val vers = ev
        .withColumn("day", expr("tus div 86400000000"))
        .groupBy(col("user_id").as("v_user"), col("day"))
        .agg(min(struct(col("tus"), col("event_id"), col("c"))).as("f"))
        .select(col("v_user"), col("day"),
          col("f.tus").as("eff_from"), col("f.c").as("state_c"))
        .withColumn("version", row_number().over(byUser).cast("long"))
        .withColumn("eff_to",
          coalesce(lead(col("eff_from"), 1).over(byUser), lit(Long.MaxValue)))
      // no broadcast hint (the q76 rule): the version table is one row
      // per user per ACTIVE DAY — it scales with the corpus, so a forced
      // broadcast would pin a growing dim on every executor per
      // micro-batch; the optimizer broadcasts while it measures small
      val dim = vers.select("v_user", "version", "state_c", "eff_from", "eff_to")
      val stream = readEventsNanos(drain, d)
        .select(col("user_id"), expr("ts div 1000").as("tus"),
          cents(col("value")).as("c"))
      val agg = stream
        .join(dim, col("user_id") === col("v_user") &&
          col("tus") >= col("eff_from") && col("tus") < col("eff_to"))
        .groupBy("user_id", "version")
        .agg(max(col("state_c")).as("state_c"),
          count(lit(1)).as("n_events"),
          (sum(col("c")) / 100.0).as("sum_value"))
      val name = "graft_stream_asof"
      drainNow(agg.writeStream.outputMode("complete")
        .format("memory").queryName(name))
      drain.table(name)
    }
    drained.select(col("user_id"), col("version"),
        (col("state_c").cast("double") / 100.0).as("state_value"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "version")
  }

  // ---------------------- q164: chained stateful aggregations (cascade)
  /** q164: TWO windowed aggregations chained inside ONE streaming query —
    * the hourly rollup re-aggregated into 6-hour blocks without leaving
    * the stream. This exercises the engine's multiple-stateful-operator
    * support (Spark ≥ 3.4): the first aggregation finalizes each 1 h
    * window as the watermark passes its end and feeds it DOWNSTREAM as an
    * append-mode row, where `window_time` re-keys it into the enclosing
    * 6 h window for the second stateful aggregation — the streaming
    * equivalent of a two-level rollup materialization chain.
    *
    * Scale: state for level 1 is (open 1 h windows × types), for level 2
    * (open 6 h windows × types) — both watermark-bounded and independent
    * of event volume; the inter-level exchange carries finalized PARTIAL
    * aggregates (one row per closed hour per type), so the second level's
    * shuffle is ~events/3600ths of the first's. This is the shape that
    * lets a 100 TB/day stream keep a minute→hour→day rollup chain in one
    * job instead of three jobs re-reading each other's sinks. Counts and
    * decimal sums are both associative, so cascading loses no exactness:
    * the drained result must land on the batch 6 h rollup, giving the
    * whole chain an exact DuckDB oracle.
    *
    * Drain mechanics: append mode only emits a window once the watermark
    * passes it, so the far-future sentinel row (never emitted itself —
    * its own windows stay open) advances the watermark past every real
    * window end and flushes BOTH levels. */
  def q164StreamCascade(s: SparkSession, d: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    withSentinelDrain(s, d, "q164") { (drain, mk) =>
      val ev = mk()
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ets", "2 hours")
      val hourly = ev
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("sv"))
      val blocks = hourly
        .groupBy(window(window_time(col("window")), "6 hours").as("w6"),
          col("event_type"))
        .agg(sum(col("n")).as("n_events"),
          sum(col("sv")).cast("double").as("sum_value"))
        .select(col("w6.start").cast("timestamp_ntz").as("win_start"),
          col("event_type"), col("n_events"), col("sum_value"))
      val name = "graft_stream_cascade"
      drainNow(blocks.writeStream.outputMode("append")
        .format("memory").queryName(name))
      drain.table(name).orderBy("win_start", "event_type")
    }
  }

  /** Shared gap-sessionization core over integer-microsecond event times —
    * the ONE definition of a session boundary, used by the batch query
    * (Relational.q28Sessionize) and the timestamp-typed twin below.
    * Input columns: event_id, user_id, value, tus (long, microseconds). */
  def sessionizeByGapUs(e: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    e.withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("tus")).as("start_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
  }

  /** Batch-mode sessionization twin for timestamp-typed events — verifies
    * the same gap semantics as the stateful stream without a harness. */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame =
    sessionizeByGapUs(
      events.select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts").cast("timestamp")).as("tus")),
      gapUs = gapMs * 1000L)
      .select(col("user_id"), col("session_seq"),
        timestamp_micros(col("start_us")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_seq")
}
