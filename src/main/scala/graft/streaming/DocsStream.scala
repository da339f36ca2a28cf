package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.ops.{StatsOps, TextOps}

/** Streaming over the `documents` table — the corpus-side streaming
  * operators (EventsStream holds the event-time ones).
  */
object DocsStream {

  private[graft] val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The one documents file-source: the in-place table in normal mode;
    * in multi-batch replay mode (see [[Replay]]) the ReplayStage
    * hash-sliced copy, one slice per micro-batch. Docs streams carry no
    * event time — their flush sentinels are staged as a strictly later
    * batch by WRITE ORDER (after the first processAllAvailable), which
    * multi-batch delivery preserves, so only the data source swaps. */
  private def readDocsStream(drain: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    if (Replay.enabled) {
      Replay.requireSource(d)
      drain.readStream.schema(docsSchema)
        .option("maxFilesPerTrigger", Replay.maxFilesPerTrigger)
        .parquet(Replay.docsSlices)
    } else {
      drain.readStream.schema(docsSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
    }

  case class TokRow(bucket: Int, token: String, sentinel: Boolean)
  case class MgState(counters: Map[String, Long])

  // ------------------------------------------- q154: streaming heavy hitters
  /** q154: STREAMING HEAVY HITTERS — q110's two-phase frequency monitor
    * with the sketch phase run as a STATEFUL STREAM: tokens hash-bucket to
    * `buckets` keyed groups, each group folds a bounded Misra-Gries
    * counter set (capacity [[StatsOps.mgCapacity]]) in
    * flatMapGroupsWithState — state stays ≤ cap counters per bucket NO
    * MATTER how large the token domain grows, which is the property that
    * distinguishes a streaming sketch from q55-style exact streaming
    * aggregation (whose state is domain-sized). Capacity 127 ≥ the 1/64
    * share threshold's denominator, so every true heavy hitter survives
    * its bucket's fold (the q110 guarantee, per bucket because a token's
    * occurrences all hash to ONE bucket).
    *
    * Flush discipline: the drain runs processAllAvailable TWICE — all
    * token batches fold first, then a staged sentinel file (one row per
    * bucket) arrives as a strictly LATER batch and makes every group emit
    * its surviving candidates and clear state. No watermark tricks: the
    * sentinel-after-data order is guaranteed by staging the file after
    * the first drain returns, not by file-listing order.
    *
    * The drained candidates are a superset of the true heavy hitters;
    * the exact batch recount + threshold (q110's phase 2, verbatim)
    * finishes the job, so the stream twin shares q110's exact DuckDB
    * oracle. */
  def q154StreamHitters(s: SparkSession, d: String, buckets: Int = 16): DataFrame = {
    val stagePath = java.nio.file.Files.createTempDirectory("graft_q154")
    val stageDir = stagePath.toString
    val name = "graft_stream_hitters"
    var cands: DataFrame = null
    try {
      cands = EventsStream.withDrainSession(s) { drain =>
        import drain.implicits._
        val toks = readDocsStream(drain, d)
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .select(pmod(hash(col("token")), lit(buckets)).as("bucket"),
            col("token"), lit(false).as("sentinel"))
        val sentinels = drain.readStream
          .schema(org.apache.spark.sql.Encoders.product[TokRow].schema)
          .parquet(stageDir)
        val out = toks.unionByName(sentinels).as[TokRow]
          .groupByKey(_.bucket)
          .flatMapGroupsWithState[MgState, (Int, String)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (bucket: Int, rows: Iterator[TokRow], state: GroupState[MgState]) =>
              val counters = scala.collection.mutable.HashMap.empty[String, Long]
              state.getOption.foreach(_.counters.foreach(counters += _))
              var flush = false
              // fold tokens first, flush-check after: row order within a
              // batch is engine-chosen, but the MG superset guarantee
              // holds under ANY fold order (and the sentinel arrives in a
              // later batch anyway — see flush discipline above)
              rows.foreach { r =>
                if (r.sentinel) flush = true
                else counters.get(r.token) match {
                  case Some(c) => counters.update(r.token, c + 1)
                  case None if counters.size < StatsOps.mgCapacity =>
                    counters.update(r.token, 1L)
                  case None =>
                    val dead = counters.collect { case (k, 1L) => k }
                    counters.mapValuesInPlace((_, c) => c - 1)
                    dead.foreach(counters.remove)
                }
              }
              if (flush) {
                state.remove()
                counters.keysIterator.map(t => (bucket, t)).toSeq.iterator
              } else {
                state.update(MgState(counters.toMap))
                Iterator.empty
              }
          }
          .toDF("bucket", "token")
        val q = out.writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          q.processAllAvailable() // every token batch folds into state
          // NOW stage the per-bucket sentinels — a strictly later batch.
          // Append, not overwrite: overwrite deletes the staged dir for a
          // moment and the file-source poller logs a spurious
          // FileNotFoundException when its listing races the delete (the
          // q225 lesson below)
          (0 until buckets).map(b => TokRow(b, null, sentinel = true))
            .toDF().write.mode("append").parquet(stageDir)
          q.processAllAvailable() // flush batch: every group emits
          Replay.logBatches(q)
        } finally q.stop()
        drain.table(name)
      }
      // phase 2, q110 verbatim: exact recount of the candidate superset
      val tok = graft.Tables.load(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val n = tok.agg(count(lit(1)).as("n_tokens"))
      tok.join(broadcast(cands.select("token").distinct()),
          Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(col("cnt") * StatsOps.hhShareDenom > col("n_tokens"))
        .select(col("token"), col("cnt"),
          (col("cnt").cast("double") / col("n_tokens").cast("double"))
            .as("share"))
        .orderBy(col("cnt").desc, col("token"))
    } finally {
      graft.FsUtil.deleteRec(stagePath)
    }
  }

  // --------------------------------------------- q199: streaming count-min
  /** q199: q190's COUNT-MIN counter grid maintained as a STREAM — the
    * simplest possible streaming sketch, and deliberately so: because
    * count-min counters are ADDITIVE over a fixed 4×512 key domain, the
    * stream needs no custom state machine at all, just a streaming
    * groupBy over (row, bucket) in complete mode. State is 2048 counters
    * FOREVER, regardless of corpus size — contrast q154, whose
    * Misra-Gries fold needs flatMapGroupsWithState precisely because its
    * per-key content is a bounded-size SET, not a grid cell. Counters
    * merge by addition across batches exactly as they merge across
    * partitions in the batch build, so the drained grid must be
    * bit-identical to q190's — the stream shares the batch counter
    * oracle ([[StatsOps.duckCmCounters]]). */
  def q199StreamCountMin(s: SparkSession, d: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val name = "graft_stream_countmin"
    EventsStream.withDrainSession(s) { drain =>
      val counters = readDocsStream(drain, d)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .select(graft.ops.HashFamily.hb48(col("tok")).as("hb"))
        .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("hb"))
        .select(col("j"),
          graft.ops.HashFamily.bucket(col("hb"), col("j"), width).as("bucket"))
        .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
      EventsStream.drainNow(counters.writeStream.outputMode("complete")
        .format("memory").queryName(name))
      drain.table(name)
    }.orderBy("j", "bucket")
  }

  // --------------------------------------- q245: streaming quantile grid
  /** q245: q236's QUANTILE-NORMALIZATION dictionary maintained as a
    * STREAM — the q199 pattern applied to ranks: the (event_type, cents)
    * VALUE-GRID counts are additive, so a complete-mode streaming
    * groupBy IS the sketch (state = one counter per occupied grid cell —
    * value-domain-bounded, not row-bounded), and the tie-averaged rank /
    * ppm-quantile tail runs in batch over the drained grid with q236's
    * exact expressions. Micro-batch merge ≡ partition merge ⇒ the
    * streamed dictionary must be bit-identical to the batch build, so
    * the stream twin SHARES q236's oracle by construction. */
  def q245StreamQuantileGrid(s: SparkSession, d: String): DataFrame = {
    val name = "graft_stream_qgrid"
    val grid = EventsStream.withDrainSession(s) { drain =>
      // through the ONE nanos-normalized events reader (ts is pruned
      // here, but a hand-rolled schema would silently declare the wrong
      // ts type the day it IS selected — the readEventsNanos contract)
      val cells = EventsStream.readEventsNanos(drain, d)
        .select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
      EventsStream.drainNow(cells.writeStream.outputMode("complete")
        .format("memory").queryName(name))
      drain.table(name)
    }
    // rank/ppm tail: ONE shared implementation with the batch q236
    StatsOps.quantileTail(grid)
  }

  case class KmvRow(lang: String, h: String, sentinel: Boolean)
  case class KmvSketch(lang: String, n_docs: Long, m: Long, kth: String)

  /** Per-language KMV accumulator on the Spark 4 `transformWithState`
    * API (typed state variables on the RocksDB store — the arbitrary-
    * state surface that supersedes flatMapGroupsWithState): one
    * ValueState counter + one ValueState holding the ≤k smallest
    * DISTINCT content hashes (fixed-width lowercase hex, so the joined
    * string round-trips through a TreeSet in numeric order). A min-k set
    * merges by union + re-take-k, so folding per micro-batch lands on
    * the same set as the one-shot batch build — the q141 mergeability
    * argument, replayed over time instead of over partitions. */
  private[graft] class KmvProcessor(k: Int) extends org.apache.spark.sql.streaming
      .StatefulProcessor[String, KmvRow, KmvSketch] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var nDocs: ValueState[Long] = _
    @transient private var minK: ValueState[String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nDocs = getHandle.getValueState[Long]("nDocs",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      minK = getHandle.getValueState[String]("minK",
        org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)
    }
    override def handleInputRows(lang: String, rows: Iterator[KmvRow],
        tv: TimerValues): Iterator[KmvSketch] = {
      var n = if (nDocs.exists()) nDocs.get() else 0L
      val set = scala.collection.mutable.TreeSet.empty[String]
      if (minK.exists() && minK.get().nonEmpty) set ++= minK.get().split(",")
      var flush = false
      rows.foreach { r =>
        if (r.sentinel) flush = true
        else {
          n += 1
          // a NULL-text doc hashes to null: the doc COUNT keeps it
          // (count(*) semantics, matching the batch twin's n_docs) but
          // the sketch set skips it (countDistinct semantics) — inserting
          // null into a natural-ordering TreeSet would NPE the executor
          if (r.h != null) set += r.h
          while (set.size > k) set -= set.last
        }
      }
      if (flush) {
        nDocs.clear(); minK.clear()
        // a sentinel for a group that never saw data (possible when the
        // sentinel lang list and the stream's source drift) flushes
        // NOTHING — set.last on the empty sketch was the sf1 crash that
        // exposed the GenScale single-file-contract break. A lang whose
        // every text is NULL also flushes nothing: NULL content is never
        // a sketch member (q141's batch contract, r11 — see its scaladoc)
        if (set.isEmpty) Iterator.empty
        else Iterator.single(KmvSketch(lang, n, set.size.toLong, set.last))
      } else {
        nDocs.update(n); minK.update(set.mkString(","))
        Iterator.empty
      }
    }
  }

  case class DayRow(event_type: String, day: Long, c: Long, sentinel: Boolean)
  case class DayOut(event_type: String, day: Long, n_events: Long,
                    sum_cents: Long)

  /** Per-type daily-spend accumulator on `transformWithState` with
    * MAPSTATE — the third and last TWS state shape (q225 ValueState,
    * q246 ListState): state is a day → (count, cents) map, point-updated
    * per row (no full-map rewrite per batch — the reason MapState exists
    * over a ValueState holding a Map), CALENDAR-bounded forever. Daily
    * cells are additive, so micro-batch merge ≡ partition merge and the
    * drained map equals the batch groupBy exactly. */
  private[graft] class DailyMapProcessor extends org.apache.spark.sql
      .streaming.StatefulProcessor[String, DayRow, DayOut] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TTLConfig, TimeMode, TimerValues}
    @transient private var days: MapState[Long, (Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      days = getHandle.getMapState[Long, (Long, Long)]("days",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(tpe: String, rows: Iterator[DayRow],
        tv: TimerValues): Iterator[DayOut] = {
      var flush = false
      rows.foreach { r =>
        if (r.sentinel) flush = true
        else {
          val (n, s) =
            if (days.containsKey(r.day)) days.getValue(r.day) else (0L, 0L)
          days.updateValue(r.day, (n + 1L, s + r.c))
        }
      }
      if (flush) {
        val out = days.iterator().map { case (day, (n, sum)) =>
          DayOut(tpe, day, n, sum)
        }.toSeq.sortBy(_.day)
        days.clear()
        out.iterator
      } else Iterator.empty
    }
  }

  // ------------------------------------------ q251: streaming daily map
  /** q251: the MapState daily-spend rollup drained through the q154/q225
    * sentinel discipline; shares a plain batch-aggregate oracle. */
  def q251StreamDailyMap(s: SparkSession, d: String): DataFrame = {
    val stagePath = java.nio.file.Files.createTempDirectory("graft_q251")
    val name = "graft_stream_dailymap"
    try {
      EventsStream.withDrainSession(s) { drain =>
        import drain.implicits._
        drain.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val rows = EventsStream.readEventsNanos(drain, d)
          .select(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("day"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("c"),
            lit(false).as("sentinel")).as[DayRow]
        val sentinels = drain.readStream
          .schema(org.apache.spark.sql.Encoders.product[DayRow].schema)
          .parquet(stagePath.toString).as[DayRow]
        val out = rows.union(sentinels)
          .groupByKey(_.event_type)
          .transformWithState(new DailyMapProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        val q = out.toDF().writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          q.processAllAvailable()
          val types = graft.Tables.load(s, d, "events")
            .select("event_type").distinct().collect().map(_.getString(0))
          types.toSeq.map(t => DayRow(t, -1L, 0L, sentinel = true)).toDF()
            .write.mode("append").parquet(stagePath.toString)
          q.processAllAvailable()
          Replay.logBatches(q)
        } finally q.stop()
        drain.table(name)
      }.orderBy("event_type", "day")
    } finally {
      graft.FsUtil.deleteRec(stagePath)
    }
  }

  case class PurchRow(event_type: String, event_id: Long, c: Long,
                      sentinel: Boolean)
  case class TopOut(event_type: String, rk: Int, event_id: Long, c: Long)

  /** Per-type running TOP-K accumulator on `transformWithState` with
    * LISTSTATE — the second face of the TWS API (q225 exercises
    * ValueState): the state variable is the bounded top-k list itself,
    * re-ranked per batch by (cents desc, id asc). Top-k sets merge by
    * union + re-take-k (the q141/q225 mergeability argument), so the
    * drained list equals the batch top-k no matter how the rows split
    * into micro-batches. */
  private[graft] class TopKProcessor(k: Int) extends org.apache.spark.sql
      .streaming.StatefulProcessor[String, PurchRow, TopOut] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TTLConfig, TimeMode, TimerValues}
    @transient private var top: ListState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[(Long, Long)]("top",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[PurchRow],
        tv: TimerValues): Iterator[TopOut] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      top.get().foreach(buf += _) // (c, event_id)
      var flush = false
      rows.foreach { r =>
        if (r.sentinel) flush = true else buf += ((r.c, r.event_id))
      }
      val best = buf.distinct.sortBy { case (c, id) => (-c, id) }.take(k)
      if (flush) {
        top.clear()
        best.iterator.zipWithIndex.map { case ((c, id), i) =>
          TopOut(key, i + 1, id, c)
        }
      } else {
        top.clear(); top.appendList(best.toArray)
        Iterator.empty
      }
    }
  }

  // --------------------------------------- q246: streaming top-k ListState
  /** q246: per-type top-k purchases as a TWS ListState stream — drains to
    * exactly the batch window top-k (ranked by cents desc, id asc), so
    * the twin keeps an exact DuckDB oracle. Same two-phase sentinel
    * discipline as q154/q225. */
  def q246StreamTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val stagePath = java.nio.file.Files.createTempDirectory("graft_q246")
    val name = "graft_stream_topk"
    try {
      EventsStream.withDrainSession(s) { drain =>
        import drain.implicits._
        drain.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // same one-reader contract as q245 above
        val rows = EventsStream.readEventsNanos(drain, d)
          .select(col("event_type"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("c"),
            lit(false).as("sentinel")).as[PurchRow]
        val sentinels = drain.readStream
          .schema(org.apache.spark.sql.Encoders.product[PurchRow].schema)
          .parquet(stagePath.toString).as[PurchRow]
        val out = rows.union(sentinels)
          .groupByKey(_.event_type)
          .transformWithState(new TopKProcessor(k),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        val q = out.toDF().writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          q.processAllAvailable()
          val types = graft.Tables.load(s, d, "events")
            .select("event_type").distinct().collect().map(_.getString(0))
          types.toSeq.map(t => PurchRow(t, -1L, 0L, sentinel = true)).toDF()
            .write.mode("append").parquet(stagePath.toString)
          q.processAllAvailable()
          Replay.logBatches(q)
        } finally q.stop()
        drain.table(name)
      }.orderBy("event_type", "rk")
    } finally {
      graft.FsUtil.deleteRec(stagePath)
    }
  }

  // ------------------------------------------------ q225: streaming KMV
  /** q225: q141's KMV DISTINCT-COUNT sketch maintained as a STREAM on
    * the `transformWithState` API — the bounded-state alternative to
    * q71-style exact streaming dedup when only the CARDINALITY is
    * needed: state is (counter + ≤k hashes) per language FOREVER,
    * regardless of corpus size. Same two-phase sentinel drain as q154
    * (all data batches fold, then one staged sentinel row per language
    * arrives strictly later and makes each group emit + clear). The
    * estimator tail runs in batch with q141's exact expressions, so the
    * stream twin keeps an exact DuckDB oracle — m < k means the sketch
    * holds EVERY distinct hash and reports exactly; otherwise the
    * (k−1)·2³²/u32 estimate is integer math both engines reproduce. */
  def q225StreamKmv(s: SparkSession, d: String, k: Int = 64): DataFrame = {
    val stagePath = java.nio.file.Files.createTempDirectory("graft_q225")
    val name = "graft_stream_kmv"
    try {
      val sk = EventsStream.withDrainSession(s) { drain =>
        import drain.implicits._
        drain.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val rows = readDocsStream(drain, d)
          .select(col("lang"),
            graft.ops.HashFamily.normMd5(col("text")).as("h"),
            lit(false).as("sentinel")).as[KmvRow]
        val sentinels = drain.readStream
          .schema(org.apache.spark.sql.Encoders.product[KmvRow].schema)
          .parquet(stagePath.toString).as[KmvRow]
        val out = rows.union(sentinels)
          .groupByKey(_.lang)
          .transformWithState(new KmvProcessor(k),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        val q = out.toDF().writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          q.processAllAvailable() // every document batch folds into state
          val langs = graft.Tables.load(s, d, "documents")
            .select("lang").distinct().collect().map(_.getString(0))
          // append, not overwrite: overwrite deletes the staged dir for a
          // moment and the file-source poller logs a spurious
          // FileNotFoundException when its listing races the delete
          langs.toSeq.map(l => KmvRow(l, null, sentinel = true)).toDF()
            .write.mode("append").parquet(stagePath.toString)
          q.processAllAvailable() // flush batch: every group emits + clears
          Replay.logBatches(q)
        } finally q.stop()
        drain.table(name)
      }
      // estimator tail in batch — q141's expressions verbatim
      sk.select(col("lang"), col("n_docs"), col("m"),
          substring(col("kth"), 1, 8).as("kth_prefix"),
          conv(substring(col("kth"), 1, 8), 16, 10).cast("long").as("u32"))
        .withColumn("est_distinct",
          when(col("m") < k, col("m"))
            .otherwise(expr(s"CAST(${(k - 1) * 4294967296L} AS BIGINT)" +
              " div greatest(u32, CAST(1 AS BIGINT))")))
        .select("lang", "n_docs", "m", "kth_prefix", "est_distinct")
        .orderBy("lang")
    } finally {
      graft.FsUtil.deleteRec(stagePath)
    }
  }
}
