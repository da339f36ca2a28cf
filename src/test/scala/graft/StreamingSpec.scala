package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

/** Structured Streaming driven synchronously: file-source windowed agg must
  * match its batch twin; sessionization state machine emits closed sessions. */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** events at sf0.001 with ts converted ns->timestamp, written to a temp
    * dir so the streaming file source can read it. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    Tables.load(spark, TestSpark.sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg == batch hourly agg (file source, memory sink)") {
    val q = EventsStream.hourlyCounts(EventsStream.readEvents(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_out")
      .agg(sum("n_events")).head.getLong(0)
    val total = Tables.load(spark, TestSpark.sf, "events").count()
    assert(streamed === total)
    // spot-check one bucket against the batch twin
    val batch = ops.Relational.q23EventsHourly(spark, TestSpark.sf)
    val bRow = batch.head
    val sMatch = spark.table("hourly_out")
      .filter(col("hour_start") === bRow.getAs[Any]("hour_start") &&
        col("event_type") === bRow.getString(1))
      .head
    assert(sMatch.getLong(2) === bRow.getLong(2))
  }

  test("hopping-window stream == batch hopping windows, 4x fan-out") {
    val streamed = EventsStream.q87StreamHopping(spark, TestSpark.sf)
    val batch = ops.Relational.q86HoppingWindow(spark, TestSpark.sf)
    // every event lands in exactly size/slide = 4 windows
    val total = Tables.load(spark, TestSpark.sf, "events").count()
    assert(streamed.agg(sum("n_events")).head.getLong(0) === total * 4)
    assert(streamed.collect().toSeq === batch.collect().toSeq)
  }

  test("chained windowed aggs (q164): streaming cascade == batch 6h rollup") {
    val streamed = EventsStream.q164StreamCascade(spark, TestSpark.sf)
    val batch = Tables.load(spark, TestSpark.sf, "events")
      .groupBy(
        timestamp_micros(expr("((ts div 1000) div 21600000000) * 21600000000"))
          .cast("timestamp_ntz").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("win_start", "event_type")
    // the two stateful levels must compose to exactly the batch rollup —
    // and the sentinel row must be invisible in the drained output
    assert(streamed.collect().toSeq === batch.collect().toSeq)
    assert(streamed.filter(col("event_type") === "sentinel").count() === 0)
  }

  test("stateful sessionization emits gap-closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val q = EventsStream.sessionize(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    def ev(id: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(minute * 60000L), 7L, "click", 1.0)
    try {
      // one user, two bursts separated by > 30 min. (Start at minute 1:
      // an event at the epoch equals the initial watermark and would be
      // dropped as late data.) The first burst emits only once the
      // watermark PROVES it closed (last + gap < wm) — an inline close at
      // fold time would be bridgeable by an admissible late event
      mem.addData(ev(1, 1), ev(2, 5), ev(3, 10), ev(4, 60), ev(5, 62))
      q.processAllAvailable()
      // wm is only minute 32 here (62 - 30): nothing is provably closed yet
      assert(spark.table("sessions_out").count() === 0)
      // push the watermark past both sessions' last + gap
      mem.addData(ev(6, 200))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("sessions_out")
      .select("user_id", "n_events", "sum_value").as[(Long, Long, Double)].collect()
    assert(sessions.contains((7L, 3L, 3.0))) // the closed first burst
    assert(sessions.contains((7L, 2L, 2.0))) // the closed second burst
  }

  test("sub-minute session gap keeps its full watermark delay (late in-gap events merge)") {
    // the watermark delay must be gapMs MILLISECONDS, not gap/60000
    // minutes: a 30 s gap under minutes-truncation gets a ZERO delay, so
    // the admissible late event below would be silently dropped and the
    // session would close at 2 events instead of merging to 3
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val q = EventsStream.sessionize(mem.toDS(), gapMs = 30000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("subgap_sessions").start()
    def ev(id: Long, sec: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(sec * 1000L), 9L, "click", 1.0)
    try {
      mem.addData(ev(1, 100)); q.processAllAvailable() // wm -> 70 s
      mem.addData(ev(2, 125)); q.processAllAvailable() // wm -> 95 s
      // 105 s is LATE (max seen is 125) but inside the 30 s delay: must merge
      mem.addData(ev(3, 105)); q.processAllAvailable()
      mem.addData(ev(4, 500)); q.processAllAvailable() // flush the session
    } finally q.stop()
    val sessions = spark.table("subgap_sessions")
      .select("user_id", "n_events").as[(Long, Long)].collect()
    assert(sessions.contains((9L, 3L)),
      s"late in-gap event was dropped: $sessions")
  }

  test("debounce retains gap-separated intervals until a late bridge can't arrive") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.BounceEvent]
    val q = EventsStream.debounceExact(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("debounce_bridge_out").start()
    def ev(id: Long, sec: Long) =
      EventsStream.BounceEvent(id, 7L, "click", sec * 1000000L,
        new java.sql.Timestamp(sec * 1000L))
    try {
      // two events 400 s apart (gap 300 s): NOT chainable directly, but a
      // bridge at t=1200 is still admissible after batch 1 (wm = 1100)
      mem.addData(ev(1, 1000), ev(3, 1400))
      q.processAllAvailable()
      // an inline close would have emitted (1, n=1) here — it must not:
      assert(spark.table("debounce_bridge_out").count() === 0)
      // the late bridge: all three must collapse into ONE burst
      mem.addData(ev(2, 1200))
      q.processAllAvailable()
      mem.addData(ev(9, 100000)) // watermark push
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("debounce_bridge_out")
      .filter(col("event_id") =!= 9L)
      .select("event_id", "tus", "n_collapsed", "span_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1000000000L, 3L, 400000000L)))
  }

  test("buffered-replay transitions reorder cross-batch late events correctly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.TransEvent]
    val q = EventsStream.transitionsExact(mem.toDS(), gapUs = 1800000000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_out").start()
    def ev(id: Long, minute: Long, tpe: String): EventsStream.TransEvent =
      EventsStream.TransEvent(id, 7L, tpe,
        minute * 60000000L, new java.sql.Timestamp(minute * 60000L))
    try {
      // batch 1: A at t=1, C at t=20 — within the 30-min watermark delay,
      // so adjacency must NOT be finalized yet
      mem.addData(ev(1, 1, "A"), ev(3, 20, "C"))
      q.processAllAvailable()
      // batch 2: B arrives LATE at t=10 (between A and C), plus a far
      // event that pushes the watermark beyond all three
      mem.addData(ev(2, 10, "B"), ev(4, 600, "Z"))
      q.processAllAvailable()
      // flush the tail
      mem.addData(ev(5, 2000, "Z"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans_out")
      .select("from_type", "to_type").as[(String, String)].collect().toSeq
    // the late B must link INTO the middle: A->B->C, never A->C
    assert(got.contains(("A", "B")) && got.contains(("B", "C")), got.toString)
    assert(!got.contains(("A", "C")), got.toString)
  }

  test("streaming transition matrix equals the batch twin at test SF") {
    val stream = EventsStream.q108StreamTransitions(spark, TestSpark.sf).collect()
    val batch = graft.ops.EtlOps.q107EventTransitions(spark, TestSpark.sf).collect()
    assert(stream.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("streaming EWMA reorders cross-batch late events and equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.EwmaEvent]
    val q = EventsStream.ewmaExact(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
    def ev(id: Long, minute: Long, vc: Long): EventsStream.EwmaEvent =
      EventsStream.EwmaEvent(id, 9L, minute * 60000000L, vc,
        new java.sql.Timestamp(minute * 60000L))
    try {
      // batch 1: 100c at t=1, 400c at t=20 (inside the delay: held)
      mem.addData(ev(1, 1, 100L), ev(3, 20, 400L))
      q.processAllAvailable()
      // batch 2: 200c arrives LATE at t=10 — must smooth BETWEEN them
      mem.addData(ev(2, 10, 200L), ev(4, 600, 0L))
      q.processAllAvailable()
      mem.addData(ev(5, 2000, 0L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_out")
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    // id 3's window must be (100, 200, 400) in time order, late 200 included
    val c = (0 until 16).map(k => 1L << (15 - k))
    // cent-quantized (trunc num/den) — the r11 q133/q137 contract
    def hand(vs: Seq[Long]): Double = {
      val num = vs.reverse.zipWithIndex.map { case (v, k) => v * c(k) }.sum
      (num / vs.indices.map(c(_)).sum).toDouble / 100.0
    }
    assert(got(1L) === hand(Seq(100L)))
    assert(got(2L) === hand(Seq(100L, 200L)))
    assert(got(3L) === hand(Seq(100L, 200L, 400L)))
    // full-table: the drained stream is byte-equal to the batch window form
    val stream = EventsStream.q137StreamEwma(spark, TestSpark.sf).collect()
    val batch = graft.ops.EtlOps.q133EwmaSmooth(spark, TestSpark.sf).collect()
    assert(stream.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("stream-stream interval join equals the batch interval join") {
    import org.apache.spark.sql.types.DecimalType
    val streamed = EventsStream.q63StreamIntervalJoin(spark, TestSpark.sf).collect()
    val e = Tables.load(spark, TestSpark.sf, "events")
      .withColumn("tus", expr("ts div 1000"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("tus").as("ct"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("tus").as("pt"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pt") >= col("ct") - 3600000000L && col("pt") <= col("ct"))
      .groupBy("click_id")
      .agg(count(lit(1)).as("n"), (sum("cents") / 100.0).as("sv"))
      .orderBy("click_id").collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("stream-stream LEFT OUTER join flushes unmatched clicks and equals the batch twin") {
    import org.apache.spark.sql.types.DecimalType
    val streamed = EventsStream.q158StreamLeftJoin(spark, TestSpark.sf).collect()
    val e = Tables.load(spark, TestSpark.sf, "events")
      .withColumn("tus", expr("ts div 1000"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("tus").as("ct"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("tus").as("pt"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pt") >= col("ct") - 3600000000L && col("pt") <= col("ct"), "left")
      .groupBy("click_id")
      .agg(count(col("cents")).as("n"), (sum("cents") / 100.0).as("sv"))
      .orderBy("click_id").collect()
    // every click emits — matched or not — and unmatched ones really exist
    assert(streamed.map(_.getLong(0)).toSet ===
      c.select("click_id").collect().map(_.getLong(0)).toSet)
    assert(streamed.exists(_.getLong(1) == 0L))
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("stream-stream FULL OUTER join flushes both unmatched sides and equals the batch twin") {
    import org.apache.spark.sql.types.DecimalType
    val streamed = EventsStream.q193StreamFullOuterJoin(spark, TestSpark.sf).collect()
    val e = Tables.load(spark, TestSpark.sf, "events")
      .withColumn("tus", expr("ts div 1000"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("tus").as("ct"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("pu"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("tus").as("pt"))
    val clickSide = c.join(p, col("cu") === col("pu") &&
        col("pt") >= col("ct") - 3600000000L && col("pt") <= col("ct"), "left")
      .groupBy("click_id")
      .agg(count(col("cents")).as("n"), (sum("cents") / 100.0).as("sv"))
      .select(lit("click").as("side"), col("click_id").as("id"), col("n"), col("sv"))
    val orphanSide = p.join(c, col("cu") === col("pu") &&
        col("ct") >= col("pt") && col("ct") <= col("pt") + 3600000000L, "left_anti")
      .select(lit("orphan_purchase").as("side"), col("p_id").as("id"),
        lit(0L).as("n"), (col("cents") / 100.0).as("sv"))
    val batch = clickSide.unionAll(orphanSide).orderBy("side", "id").collect()
    // both outer faces are really exercised at this SF
    assert(streamed.exists(r => r.getString(0) == "click" && r.getLong(2) == 0L),
      "no unmatched click emitted")
    assert(streamed.exists(_.getString(0) == "orphan_purchase"),
      "no orphan purchase emitted")
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("streaming CUSUM equals the batch window form (state folds, sentinel flushes)") {
    // batch 1 folds the daily sums into state; the staged sentinel arrives
    // as batch 2 and flushes — so cross-batch state persistence is on the
    // path even though the events table is a single file
    val stream = EventsStream.q202StreamCusum(spark, TestSpark.sf).collect().map(_.toSeq)
    val batch = graft.ops.EtlOps.q155CusumChangepoint(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.toSeq === batch.toSeq)
  }

  test("streaming count-min counter grid is bit-identical to the batch build") {
    val stream = graft.streaming.DocsStream.q199StreamCountMin(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val batch = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(expr(
        "CAST(conv(substr(md5(CAST(tok AS BINARY)), 1, 12), 16, 10) AS BIGINT)").as("hb"))
      .select(explode(sequence(lit(0), lit(3))).as("j"), col("hb"))
      .select(col("j"),
        (((col("hb") * (col("j") * 2 + 1) + col("j")) % lit(1L << 48)) % 512).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("j", "bucket").collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.toSeq === batch.toSeq)
  }

  test("streaming dedup collapses double delivery to the batch aggregate") {
    val streamed = graft.streaming.EventsStream.q71StreamDedup(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val batch = Tables.load(spark, TestSpark.sf, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        (org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("value")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))
            .multiply(100).cast("long")) / 100.0).as("sum_value"))
      .orderBy("event_type")
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming heavy hitters equal the batch two-phase answer exactly") {
    val stream = graft.streaming.DocsStream
      .q154StreamHitters(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.ops.StatsOps
      .q110HeavyHitters(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(stream.toSeq === batch.toSeq) // order included
    assert(stream.nonEmpty)
  }

  test("batch sessionization twin agrees on session boundaries") {
    val ev = Seq(
      (1L, 0L, 7L, 1.0), (2L, 5L, 7L, 1.0), (3L, 60L, 7L, 1.0))
      .toDF("event_id", "tmin", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("tmin") * 60000000L))
    val out = EventsStream.sessionizeBatch(ev).collect()
    assert(out.length === 2) // two sessions: {1,2} and {3}
  }

  test("built-in session_window stream equals the batch session_window twin") {
    val streamed = EventsStream.q187StreamSessionWindow(spark, TestSpark.sf)
    val batch = ops.Relational.q83SessionWindow(spark, TestSpark.sf)
    assert(streamed.collect().map(_.toSeq).toSeq ===
      batch.collect().map(_.toSeq).toSeq)
  }

  test("streaming debounce merges cross-batch bursts and equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.BounceEvent]
    val q = EventsStream.debounceExact(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("debounce_out").start()
    // base offset keeps the first event clear of the initial watermark edge
    def ev(id: Long, sec: Long, uid: Long = 7L, tpe: String = "click") =
      EventsStream.BounceEvent(id, uid, tpe, (1000 + sec) * 1000000L,
        new java.sql.Timestamp((1000 + sec) * 1000L))
    try {
      // burst head + a row 200 s later (gap is 300 s)
      mem.addData(ev(1, 0), ev(3, 200))
      q.processAllAvailable()
      // batch 2: id 2 lands BETWEEN them (late, inside the watermark) and
      // id 4 chains the burst onward; a far event of ANOTHER key advances
      // the watermark without touching this burst
      mem.addData(ev(2, 100), ev(4, 450), ev(90, 100000, uid = 8L))
      q.processAllAvailable()
      // push the watermark past lastTs + gap so the open burst times out
      mem.addData(ev(91, 200000, uid = 8L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("debounce_out")
      .filter(col("user_id") === 7L)
      .select("event_id", "tus", "n_collapsed", "span_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // ONE burst: head id 1 at t=0, absorbing 4 rows over 450 s
    assert(got === Seq((1L, 1000000000L, 4L, 450000000L)))
    // full-table: the drained stream is byte-equal to the batch window form
    val stream = EventsStream.q176StreamDebounce(spark, TestSpark.sf).collect()
    val batch = graft.ops.EtlOps.q138Debounce(spark, TestSpark.sf).collect()
    assert(stream.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("stream-static as-of enrichment equals a batch interval-join recompute") {
    import org.apache.spark.sql.functions._
    val got = EventsStream.q214StreamAsofEnrich(spark, TestSpark.sf)
    // independent batch recompute of the same daily-version enrichment
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"),
        EventsStream.cents(col("value")).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val versions = rows.groupBy(_._2 / 86400000000L).toSeq
        .map { case (day, g) => (day, g.minBy(r => (r._2, r._3))) }
        .sortBy(_._1).zipWithIndex
        .map { case ((_, first), i) => (i + 1L, first._2, first._4) }
      val bounds = versions.map(_._2) :+ Long.MaxValue
      versions.map { case (ver, from, stateC) =>
        val to = bounds(ver.toInt)
        val in = rows.filter(r => r._2 >= from && r._2 < to)
        (u, ver, stateC.toDouble / 100.0, in.length.toLong,
          in.map(_._4).sum.toDouble / 100.0)
      }
    }.filter(_._4 > 0).sortBy(t => (t._1, t._2))
    val gotRows = got.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(gotRows === want)
    // every event lands in exactly one version: counts conserve
    assert(gotRows.map(_._4).sum === ev.length.toLong)
  }

  test("q225 streamed KMV sketch lands on the batch q141 sketch") {
    val stream = graft.streaming.DocsStream.q225StreamKmv(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val batch = graft.ops.StatsOps.q141KmvSketch(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(stream.nonEmpty)
    // shared columns agree row-for-row: (lang, n_docs, kth_prefix, est)
    assert(stream.map(t => (t._1, t._2, t._4, t._5)).toSeq ===
      batch.map(t => (t._1, t._2, t._4, t._5)).toSeq)
    // the stream's m is the sketch fill: min(k, n_distinct)
    stream.zip(batch).foreach { case (sRow, bRow) =>
      assert(sRow._3 === math.min(64L, bRow._3))
    }
  }

  test("q225 KMV state survives a stop/restart from the checkpoint") {
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("kmv_src").toString
    val sentDir = Files.createTempDirectory("kmv_sent").toString
    val ckpt = Files.createTempDirectory("kmv_ckpt").toString
    val outDir = Files.createTempDirectory("kmv_out").toString
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    docs.filter(pmod(col("doc_id"), lit(2)) === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val drain = spark.newSession()
    drain.conf.set("spark.sql.shuffle.partitions", "8")
    drain.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import drain.implicits._
    import graft.streaming.DocsStream
    def pipeline() = {
      val rows = drain.readStream.schema(DocsStream.docsSchema)
        .parquet(srcDir)
        .select(col("lang"), md5(regexp_replace(lower(col("text")),
          "[ \\t\\n\\x0B\\f\\r]+", " ").cast("binary")).as("h"),
          lit(false).as("sentinel"))
        .as[DocsStream.KmvRow]
      val sent = drain.readStream
        .schema(org.apache.spark.sql.Encoders.product[DocsStream.KmvRow].schema)
        .parquet(sentDir).as[DocsStream.KmvRow]
      rows.union(sent).groupByKey(_.lang)
        .transformWithState(new DocsStream.KmvProcessor(64),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF()
    }
    def run(): Unit = {
      // memory sink cannot recover from a checkpoint — foreachBatch can,
      // and it is the recoverable-sink shape a real pipeline uses
      val q = pipeline().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // first half folds into RocksDB state, then the query DIES
    // the second half AND the flush sentinels arrive while it is down
    docs.filter(pmod(col("doc_id"), lit(2)) === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.toSeq.map(l => DocsStream.KmvRow(l, null, sentinel = true)).toDF()
      .write.mode("append").parquet(sentDir)
    run() // restart: recovered state + new batch must equal one-shot
    val got = drain.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // one-shot expectation straight from the batch table
    val all = docs.select(col("lang"), md5(regexp_replace(lower(col("text")),
        "[ \\t\\n\\x0B\\f\\r]+", " ").cast("binary")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val want = all.groupBy(_._1).toSeq.map { case (lang, g) =>
      val mink = g.map(_._2).distinct.sorted.take(64)
      (lang, g.length.toLong, mink.length.toLong, mink.last)
    }.sortBy(_._1)
    assert(got.toSeq === want)
  }

  /** Shared stop/restart recovery harness (r6 verdict item 7 — the q225
    * RocksDB recovery spec generalized): run `pipeline` over a parquet
    * source dir with a checkpointed foreachBatch sink, kill it, add more
    * input while it is DOWN, restart from the checkpoint, and return
    * everything emitted across both lives. */
  private def runRecovered(drain: org.apache.spark.sql.SparkSession,
      ckpt: String, outDir: String,
      pipeline: () => org.apache.spark.sql.DataFrame)(
      betweenRuns: => Unit): org.apache.spark.sql.DataFrame = {
    def run(): Unit = {
      val q = pipeline().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    betweenRuns
    run()
    drain.read.parquet(outDir)
  }

  private def rocksDrain(): org.apache.spark.sql.SparkSession = {
    val drain = spark.newSession()
    drain.conf.set("spark.sql.shuffle.partitions", "8")
    drain.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    drain
  }

  test("q246 ListState top-k survives a stop/restart from the checkpoint") {
    import graft.streaming.DocsStream
    val srcDir = Files.createTempDirectory("topk_src").toString
    val ckpt = Files.createTempDirectory("topk_ckpt").toString
    val outDir = Files.createTempDirectory("topk_out").toString
    val rows = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"),
        lit(false).as("sentinel"))
    rows.filter(pmod(col("event_id"), lit(2)) === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val drain = rocksDrain()
    import drain.implicits._
    def pipeline() = drain.readStream
      .schema(org.apache.spark.sql.Encoders.product[DocsStream.PurchRow].schema)
      .parquet(srcDir).as[DocsStream.PurchRow]
      .groupByKey(_.event_type)
      .transformWithState(new DocsStream.TopKProcessor(5),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF()
    val got = runRecovered(drain, ckpt, outDir, pipeline _) {
      // second half AND the flush sentinels land while the query is DOWN:
      // the restart must merge them into the RECOVERED ListState top-k
      rows.filter(pmod(col("event_id"), lit(2)) === 1).coalesce(1)
        .write.mode("append").parquet(srcDir)
      val types = rows.select("event_type").distinct()
        .collect().map(_.getString(0))
      types.toSeq.map(t => DocsStream.PurchRow(t, -1L, 0L, sentinel = true))
        .toDF().write.mode("append").parquet(srcDir)
    }.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val want = rows.select("event_type", "event_id", "c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (tpe, g) =>
        g.map(x => (x._3, x._2)).distinct.sortBy { case (c, id) => (-c, id) }
          .take(5).zipWithIndex
          .map { case ((c, id), i) => (tpe, i + 1, id, c) }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("q251 MapState daily map survives a stop/restart from the checkpoint") {
    import graft.streaming.DocsStream
    val srcDir = Files.createTempDirectory("dmap_src").toString
    val ckpt = Files.createTempDirectory("dmap_ckpt").toString
    val outDir = Files.createTempDirectory("dmap_out").toString
    val rows = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_type"), col("event_id"),
        expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
    rows.filter(pmod(col("event_id"), lit(2)) === 0)
      .select(col("event_type"), col("day"), col("c"), lit(false).as("sentinel"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val drain = rocksDrain()
    import drain.implicits._
    def pipeline() = drain.readStream
      .schema(org.apache.spark.sql.Encoders.product[DocsStream.DayRow].schema)
      .parquet(srcDir).as[DocsStream.DayRow]
      .groupByKey(_.event_type)
      .transformWithState(new DocsStream.DailyMapProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF()
    val got = runRecovered(drain, ckpt, outDir, pipeline _) {
      rows.filter(pmod(col("event_id"), lit(2)) === 1)
        .select(col("event_type"), col("day"), col("c"), lit(false).as("sentinel"))
        .coalesce(1).write.mode("append").parquet(srcDir)
      val types = rows.select("event_type").distinct()
        .collect().map(_.getString(0))
      types.toSeq.map(t => DocsStream.DayRow(t, -1L, 0L, sentinel = true))
        .toDF().write.mode("append").parquet(srcDir)
    }.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // point-updated MapState cells recovered from RocksDB must fold the
    // down-time rows into exactly the batch (type, day) rollup
    val want = rows.collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2)).toSeq.map { case ((tpe, day), g) =>
        (tpe, day, g.length.toLong, g.map(_._3).sum)
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("q60 session state survives a stop/restart from the checkpoint") {
    val srcDir = Files.createTempDirectory("sess_src").toString
    val ckpt = Files.createTempDirectory("sess_ckpt").toString
    val outDir = Files.createTempDirectory("sess_out").toString
    val exact = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
        expr("ts div 1000").as("tus"))
      .withColumn("ts", timestamp_micros(col("tus")))
      .select("event_id", "user_id", "cents", "tus", "ts")
    val bounds = exact.agg(min("tus"), max("tus")).head()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
    // TIME split, not parity: a restart resumes with the checkpointed
    // watermark, so the down-time half must be entirely above it or the
    // source itself would legitimately drop rows and test nothing
    exact.filter(col("tus") < mid).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val drain = rocksDrain()
    import drain.implicits._
    def pipeline() = EventsStream.sessionizeExact(
      drain.readStream
        .schema(org.apache.spark.sql.Encoders.product[EventsStream.ExactEvent].schema)
        .parquet(srcDir).as[EventsStream.ExactEvent]).toDF()
    val got = runRecovered(drain, ckpt, outDir, pipeline _) {
      // later half + the far-future sentinel arrive while the query is
      // DOWN; cross-boundary sessions must merge from recovered state
      exact.filter(col("tus") >= mid).coalesce(1)
        .write.mode("append").parquet(srcDir)
      val sentinelUs = bounds.getLong(1) + 10L * 24 * 3600 * 1000000
      Seq((-1L, -1L, 0L, sentinelUs))
        .toDF("event_id", "user_id", "cents", "tus")
        .withColumn("ts", timestamp_micros(col("tus")))
        .write.mode("append").parquet(srcDir)
    }.filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // one-shot twin: the same state machine drained without any restart
    // (itself pinned to q28's exact oracle)
    val want = EventsStream.q60StreamSessionize(spark, TestSpark.sf)
      .select(col("user_id"),
        expr("unix_micros(cast(session_start AS TIMESTAMP))").as("start_us"),
        col("n_events"),
        expr("CAST(round(sum_value * 100, 0) AS BIGINT)").as("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("q137 buffered-replay EWMA state survives a stop/restart from the checkpoint") {
    // the order-sensitive family (q108/q137): recovered state must carry
    // BOTH the emitted history (the last ≤15 observations, which every
    // future smoothed value depends on) AND the still-held reorder buffer
    val srcDir = Files.createTempDirectory("ewma_src").toString
    val ckpt = Files.createTempDirectory("ewma_ckpt").toString
    val outDir = Files.createTempDirectory("ewma_out").toString
    val exact = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tus"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"))
      .withColumn("ts", timestamp_micros(col("tus")))
      .select("event_id", "user_id", "tus", "vc", "ts")
    val bounds = exact.agg(min("tus"), max("tus")).head()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
    exact.filter(col("tus") < mid).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val drain = rocksDrain()
    import drain.implicits._
    def pipeline() = EventsStream.ewmaExact(
      drain.readStream
        .schema(org.apache.spark.sql.Encoders.product[EventsStream.EwmaEvent].schema)
        .parquet(srcDir).as[EventsStream.EwmaEvent]).toDF()
    val got = runRecovered(drain, ckpt, outDir, pipeline _) {
      exact.filter(col("tus") >= mid).coalesce(1)
        .write.mode("append").parquet(srcDir)
      val sentinelUs = bounds.getLong(1) + 10L * 24 * 3600 * 1000000
      Seq((-1L, -1L, sentinelUs, 0L))
        .toDF("event_id", "user_id", "tus", "vc")
        .withColumn("ts", timestamp_micros(col("tus")))
        .select("event_id", "user_id", "tus", "vc", "ts")
        .write.mode("append").parquet(srcDir)
    }.filter(col("user_id") >= 0)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val want = EventsStream.q137StreamEwma(spark, TestSpark.sf)
      .select("user_id", "event_id", "tus", "value", "ewma")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("q245 streamed quantile grid is row-identical to the batch q236 build") {
    val stream = graft.streaming.DocsStream.q245StreamQuantileGrid(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val batch = graft.ops.StatsOps.q236QuantileNormalize(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.toSeq === batch.toSeq)
  }

  test("q250 timer-based sessions are row-identical to the q60 timeout form") {
    val timer = EventsStream.q250StreamTimerSessions(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val timeout = EventsStream.q60StreamSessionize(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    assert(timer.nonEmpty && timer.toSeq === timeout.toSeq)
  }

  test("q251 MapState daily rollup equals the batch aggregate") {
    val stream = graft.streaming.DocsStream.q251StreamDailyMap(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val batch = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"), sum("c").as("sum_cents"))
      .orderBy("event_type", "day").collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.toSeq === batch.toSeq)
  }
}
