package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.{EtlOps, TextOps}

class EtlOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // ------------------------------------------------------------ q73 merge
  test("merge upsert: every key appears once and action partitions the key space") {
    val m = EtlOps.q73MergeUpsert(spark, sf)
    assert(m.groupBy("custkey").count().filter(col("count") > 1).count() === 0)
    // inserts are exactly the delta-only keys (>= 1200 by construction)
    assert(m.filter(col("action") === "insert" && col("custkey") < 1200).count() === 0)
    // keep-rows carry their balance through unchanged
    assert(m.filter(col("action") === "keep" && col("old_bal") =!= col("new_bal"))
      .count() === 0)
  }

  test("merge upsert: new_bal - old_bal equals the delta aggregate") {
    val dec = DecimalType(18, 2)
    val delta = Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate").cast("timestamp_ntz") >=
        lit(java.time.LocalDateTime.parse("2000-01-01T00:00:00")))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("expect_delta"))
    val m = EtlOps.q73MergeUpsert(spark, sf)
    val bad = m.join(delta, Seq("custkey"))
      .filter(abs(col("new_bal") - col("old_bal") - col("expect_delta")) > 1e-9)
    assert(bad.count() === 0)
  }

  // ------------------------------------------------------------ q75 bloom
  test("bloom prefilter never loses a joining row (result == plain join)") {
    val plain = {
      val urgent = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      Tables.load(spark, sf, "lineitem")
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
        .orderBy("l_returnflag")
    }
    assert(EtlOps.q75BloomJoin(spark, sf).collect().map(_.toSeq).toSeq ===
      plain.collect().map(_.toSeq).toSeq)
  }

  test("bloom prefilter keeps every true key and drops most others") {
    val urgent = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.load(spark, sf, "lineitem")
    val kept = EtlOps.bloomSemiFilter(li, "l_orderkey", urgent, "o_orderkey")
    // no false negatives: the semi-join survivors are all kept
    val trueKeys = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(kept.count() >= trueKeys.count())
    assert(trueKeys.join(kept.select("l_orderkey", "l_linenumber").distinct(),
      Seq("l_orderkey", "l_linenumber"), "left_anti").count() === 0)
    // selective: at 1% fpp the keep rate should sit near the true match rate
    assert(kept.count() <= (trueKeys.count() * 1.2 + li.count() * 0.05).toLong)
  }

  test("bloom prefilter caps the bit array past 256 MB and stays exact") {
    // claim 3e8 expected keys: the optimal array (~2.9e9 bits at 1% fpp)
    // crosses the 256 MB cap, so the filter keeps its size and fpp rises —
    // the true-key guarantee (no false negatives) must survive the cap
    val urgent = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.load(spark, sf, "lineitem")
    val kept = EtlOps.bloomSemiFilter(li, "l_orderkey", urgent, "o_orderkey",
      expectedItems = Some(300000000L))
    val trueKeys = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    assert(trueKeys.join(kept.select("l_orderkey", "l_linenumber").distinct(),
      Seq("l_orderkey", "l_linenumber"), "left_anti").count() === 0)
  }

  // ------------------------------------------------------------ q72 tfidf
  test("tfidf: ranks are 1..N per lang and ordered by score desc") {
    val t = TextOps.q72TfidfTerms(spark, sf)
    import spark.implicits._
    val byLang = t.select("lang", "rk", "score").as[(String, Long, Double)]
      .collect().groupBy(_._1)
    byLang.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      // score is non-increasing with rank
      sorted.map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ => ()
      }
    }
  }

  test("tfidf: a term present in every document scores zero") {
    // idf = ln(N/N) = 0 — verify on a synthetic corpus where 'x' is universal
    import spark.implicits._
    val docs = Seq((1L, "x alpha", "en"), (2L, "x beta", "en"), (3L, "x alpha", "en"))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    docs.withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q72TfidfTerms(spark, dir, topN = 10)
    val x = out.filter(col("term") === "x").select("score").collect()
    assert(x.nonEmpty && x.forall(_.getDouble(0) === 0.0))
    val alpha = out.filter(col("term") === "alpha").select("df").collect()
    assert(alpha.head.getLong(0) === 2L)
  }

  // ------------------------------------------------------------ q74 chunks
  test("doc chunks: chunk count matches the integer formula and ids are dense") {
    val c = TextOps.q74DocChunks(spark, sf)
    val nt = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("nt"))
    val perDoc = c.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"), max("chunk_id").as("max_id"),
      min("chunk_id").as("min_id"))
      .join(nt, "doc_id")
    val bad = perDoc.filter(
      col("min_id") =!= 0 || col("max_id") =!= col("n_chunks") - 1 ||
        col("n_chunks") =!=
          floor((greatest(col("nt") - 64, lit(0)) + 47) / 48) + 1)
    assert(bad.count() === 0)
  }

  test("doc chunks: a short document is exactly one chunk equal to its text") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("nt"),
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ").cast("binary"))
          .as("norm_md5"))
      .filter(col("nt") <= 64)
    val one = TextOps.q74DocChunks(spark, sf)
      .join(docs, Seq("doc_id"))
    assert(docs.count() > 0)
    // single chunk, and its md5 is the normalized full text's md5
    assert(one.filter(col("chunk_id") =!= 0).count() === 0)
    assert(one.filter(col("chunk_md5") =!= col("norm_md5")).count() === 0)
  }

  test("doc chunks: consecutive chunks overlap by window - stride tokens") {
    // structural: every non-final chunk holds exactly `window` tokens
    val c = TextOps.q74DocChunks(spark, sf)
    val maxIds = c.groupBy("doc_id").agg(max("chunk_id").as("max_id"))
    val nonFinal = c.join(maxIds, "doc_id").filter(col("chunk_id") < col("max_id"))
    assert(nonFinal.filter(col("n_chunk_tokens") =!= 64).count() === 0)
  }

  // --------------------------------------------------- q79 streaming merge
  test("streaming CDC apply over split delta files equals the batch merge") {
    // split the orders delta across two files -> two micro-batches
    val root = java.nio.file.Files.createTempDirectory("graft_q79_spec")
    val orders = Tables.load(spark, sf, "orders")
    // pathGlobFilter matches LEAF file names, so each delta must land as a
    // plain file like the driver testdata tables
    TestSpark.writeSingleFile(
      orders.filter(col("o_orderkey") % 2 === 0), s"$root/orders_a.parquet")
    TestSpark.writeSingleFile(
      orders.filter(col("o_orderkey") % 2 === 1), s"$root/orders_b.parquet")
    val streamed = graft.streaming.IngestStream.streamMergeOrders(
      spark, root.toString, "orders_*.parquet",
      Tables.load(spark, sf, "customer"), orders.schema)
    val batch = graft.ops.EtlOps.q73MergeUpsert(spark, sf)
    assert(streamed.collect().map(_.toSeq).toSeq ===
      batch.collect().map(_.toSeq).toSeq)
  }

  test("CDC state fold is idempotent per batch and survives a crashed tmp write") {
    // drive applyBatch directly (the foreachBatch body): a re-delivered
    // batchId must be a no-op — the merge is associative, NOT idempotent,
    // so re-applying would double-count — and a partial state_b.tmp left
    // by a crash mid-write must be cleared by the retry, not read
    import graft.streaming.IngestStream
    val ops = graft.ops.EtlOps
    val root = java.nio.file.Files.createTempDirectory("graft_q79_idem")
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    ops.mergeBaseState(customer).write.mode("overwrite")
      .parquet(s"$root/state_-1")
    val d0 = orders.filter(col("o_orderkey") % 2 === 0)
    val d1 = orders.filter(col("o_orderkey") % 2 === 1)
    IngestStream.applyBatch(root, d0, 0L)
    // simulate a crash mid-write of batch 1: a partial tmp dir exists
    java.nio.file.Files.createDirectories(
      java.nio.file.Path.of(s"$root/state_1.tmp/garbage"))
    IngestStream.applyBatch(root, d1, 1L)
    val once = ops.presentMerge(spark.read.parquet(s"$root/state_1"))
      .orderBy("custkey").collect().map(_.toSeq).toSeq
    // re-deliver the LATEST batch (crash after its rename, before the
    // checkpoint commit — the only re-delivery Spark's offset log allows,
    // since batch b+1 never starts until b committed): must be a no-op
    IngestStream.applyBatch(root, d1, 1L)
    val twice = ops.presentMerge(spark.read.parquet(s"$root/state_1"))
      .orderBy("custkey").collect().map(_.toSeq).toSeq
    assert(twice === once, "re-delivered batch was re-applied")
    // the fold over splits equals the one-shot batch merge
    val batchTwin = ops.q73MergeUpsert(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(once === batchTwin)
    // only the latest state survives pruning; no tmp dirs linger
    import scala.jdk.CollectionConverters._
    val names = java.nio.file.Files.list(root).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("state_")).toSeq
    assert(names.sorted === Seq("state_1"))
  }

  // ------------------------------------------------------- q80 latest-per-key
  test("latest-per-key agg equals the row_number window formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").desc, col("event_id").desc)
    val windowed = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        expr("ts div 1000").as("tus"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("tus").as("last_tus"))
      .orderBy("user_id")
    assert(graft.ops.EtlOps.q80LatestPerKey(spark, sf).collect().map(_.toSeq).toSeq ===
      windowed.collect().map(_.toSeq).toSeq)
  }

  // ------------------------------------------------------------ q81 funnel
  test("funnel stages are ordered and monotonically shrinking") {
    val f = graft.ops.EtlOps.q81EventFunnel(spark, sf).head
    val (nU, nS, nC, nP) = (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3))
    assert(nU >= nS && nS >= nC && nC >= nP)
    assert(nC > 0) // the corpus has converting users
    // stage latencies are non-negative by construction of the time joins
    assert(f.getDouble(4) >= 0.0 && f.getDouble(5) >= 0.0)
  }

  test("funnel click stage only counts clicks at-or-after the user's signup") {
    val e = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tus").as("t_s"))
    // a user whose clicks are all BEFORE signup must not be in the click stage
    val expected = e.filter(col("event_type") === "click")
      .join(su, "user_id").filter(col("tus") >= col("t_s"))
      .select("user_id").distinct().count()
    assert(graft.ops.EtlOps.q81EventFunnel(spark, sf).head.getLong(2) === expected)
  }

  // ---------------------------------------------------------- q82 retention
  test("retention cohort grid partitions per-user activity exactly") {
    val r = graft.ops.EtlOps.q82RetentionCohorts(spark, sf)
    // offset 0 exists for every cohort (the cohort week itself is active)
    val cohorts = r.select("cohort_week").distinct().count()
    assert(r.filter(col("week_offset") === 0).count() === cohorts)
    assert(r.filter(col("week_offset") < 0).count() === 0)
    // each cohort's offset-0 cell counts exactly its first-week users
    val e = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000 div 7").as("week"))
    val firsts = e.groupBy("user_id").agg(min("week").as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("n_new"))
    val bad = r.filter(col("week_offset") === 0)
      .join(firsts, "cohort_week").filter(col("n_active") =!= col("n_new"))
    assert(bad.count() === 0)
  }

  // ------------------------------------------------------ q83 session_window
  test("built-in session_window equals the lag formulation row for row") {
    val builtin = graft.ops.Relational.q83SessionWindow(spark, sf)
    val lagForm = graft.ops.Relational.q28Sessionize(spark, sf)
    assert(builtin.collect().map(_.toSeq).toSeq ===
      lagForm.collect().map(_.toSeq).toSeq)
  }

  test("session_window gap+1us merges an exactly-gap-spaced successor like q28 does") {
    import spark.implicits._
    // two events exactly 30min apart: q28's diff<=gap merges them; the
    // built-in's strict < would split them without the +1us adjustment
    val gapUs = 30L * 60 * 1000 * 1000
    val t0 = 1700000000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_q83").toString
    TestSpark.writeSingleFile(
      Seq((1L, t0 * 1000, 7L, "click", 1.0, "{}"),
        (2L, (t0 + gapUs) * 1000, 7L, "click", 2.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      s"$dir/events.parquet")
    val sessions = graft.ops.Relational.q83SessionWindow(spark, dir).collect()
    assert(sessions.length === 1 && sessions.head.getLong(3) === 2L)
  }

  // ---------------------------------------------------------- q84 weighted
  test("weighted sample keeps at roughly the quality-score rate per lang") {
    val r = graft.ops.TextOps.q84WeightedSample(spark, sf)
      .withColumn("avg_q", col("sum_q_all") / col("n_total"))
    // the content-hash draw realizes ~avg quality per stratum (/256
    // quantization + sampling noise; the corpus has >=90 docs per lang)
    val off = r.filter(abs(col("rate") - col("avg_q")) > 0.2)
    assert(off.count() === 0)
    assert(r.filter(col("n_kept") >= col("n_total")).count() === 0)
    // kept mass is a strict subset of total mass
    assert(r.filter(col("sum_q_kept") > col("sum_q_all")).count() === 0)
  }

  // ---------------------------------------------------------- compaction
  test("compaction collapses small files without changing the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val src = Tables.load(spark, sf, "orders")
    src.repartition(17).write.parquet(dir)
    val sumBefore = spark.read.parquet(dir)
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
      .head.getDecimal(0)
    val (before, after) = graft.ingest.Compaction.compact(spark, dir)
    assert(before === 17 && after < 17)
    val out = spark.read.parquet(dir)
    assert(out.count() === src.count())
    assert(out.agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
      .head.getDecimal(0) === sumBefore)
  }

  test("compaction refuses a streaming-sink table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_sink").toString + "/t"
    Tables.load(spark, sf, "region").write.parquet(dir)
    java.nio.file.Files.createDirectory(java.nio.file.Path.of(dir, "_spark_metadata"))
    val e = intercept[IllegalArgumentException] {
      graft.ingest.Compaction.compact(spark, dir)
    }
    assert(e.getMessage.contains("_spark_metadata"))
  }

  // ------------------------------------------------------------ q77 centroids
  test("label centroids: one row per (label, pos) and counts match the table") {
    val c = graft.ops.SimilarityOps.q77LabelCentroids(spark, sf)
    val labels = Tables.load(spark, sf, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("expect_n"))
    assert(c.count() === labels.count() * 64)
    val bad = c.join(labels, "label").filter(col("n_vecs") =!= col("expect_n"))
    assert(bad.count() === 0)
  }

  test("label centroids match a driver-side average within rounding") {
    val row = graft.ops.SimilarityOps.q77LabelCentroids(spark, sf)
      .filter(col("label") === 0 && col("pos") === 0).head
    val comps = Tables.load(spark, sf, "embeddings")
      .filter(col("label") === 0)
      .select(element_at(col("embedding"), 1).cast("double")).collect()
      .map(_.getDouble(0))
    val expect = comps.map(v => BigDecimal(v).setScale(7, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / comps.length
    assert(math.abs(row.getAs[Double]("centroid") - expect) < 1e-6)
  }

  // ------------------------------------------------------------ q78 pii
  test("pii scrub counts and redacts planted PII") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at jane.doe@example.com or +1 555-1234 today"),
      (2L, "see https://example.com/a?b=1 and http://x.org plus bob@x.io"),
      (3L, "clean text with no identifiers at all"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextOps.q78PiiScrub(spark, dir).collect()
    val m = out.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(m(1L) === ((1, 0, 1)))
    assert(m(2L) === ((1, 2, 0)))
    assert(m(3L) === ((0, 0, 0)))
    // the redacted text is actually scrubbed: no pattern matches post-redaction
    val scrubbed = docs.select(graft.ops.TextOps.redact(col("text")).as("r"))
      .filter(col("r").rlike(graft.ops.TextOps.emailPattern) ||
        col("r").rlike(graft.ops.TextOps.urlPattern) ||
        col("r").rlike(graft.ops.TextOps.phonePattern))
    assert(scrubbed.count() === 0)
  }

  // ------------------------------------------------------ q76 stream-static
  test("SCD2 history: dense versions, chained intervals, one current row per key") {
    val hist = ops.EtlOps.q93Scd2History(spark, sf).collect()
      .groupBy(_.getAs[Long]("custkey"))
    assert(hist.nonEmpty)
    hist.values.foreach { rows =>
      val byV = rows.sortBy(_.getAs[Long]("version"))
      assert(byV.map(_.getAs[Long]("version")).toSeq === (1L to rows.length).toSeq)
      // each version's valid_to is exactly the next version's valid_from
      byV.zip(byV.drop(1)).foreach { case (cur, nxt) =>
        assert(cur.getAs[java.time.LocalDateTime]("valid_to") ===
          nxt.getAs[java.time.LocalDateTime]("valid_from"))
      }
      assert(byV.count(_.getAs[Boolean]("is_current")) === 1)
      assert(byV.last.getAs[Boolean]("is_current"))
    }
  }

  test("resample+LOCF: dense hourly grid, counts preserved, state carries forward") {
    val grid = ops.EtlOps.q95ResampleFfill(spark, sf).collect()
    val byUser = grid.groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    byUser.values.foreach { rows =>
      val hours = rows.map(_.getLong(1)).sorted
      // dense: every hour between first and last exists exactly once
      assert(hours.toSeq === (hours.head to hours.last).toSeq)
      // first and last grid hours are real observations by construction
      assert(rows.minBy(_.getLong(1)).getLong(2) > 0)
      assert(rows.maxBy(_.getLong(1)).getLong(2) > 0)
      // LOCF: null only before the first observation (never, here), and
      // on observed hours the carried value equals the hour's own last
      rows.sortBy(_.getLong(1)).foreach { r =>
        assert(!r.isNullAt(4))
        if (!r.isNullAt(3)) assert(r.getDouble(4) === r.getDouble(3))
      }
    }
    val total = Tables.load(spark, sf, "events").filter(col("user_id") < 8).count()
    assert(grid.map(_.getLong(2)).sum === total)
  }

  test("stream-static enrichment equals the batch join aggregate") {
    val stream = graft.streaming.EventsStream.q76StreamStaticJoin(spark, sf)
    val batch = Tables.load(spark, sf, "events")
      .join(Tables.load(spark, sf, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(graft.streaming.EventsStream.cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy("segment", "event_type")
    assert(stream.collect().map(_.toSeq).toSeq === batch.collect().map(_.toSeq).toSeq)
  }

  // ---------------------------------------------------- q106 snapshot diff
  test("snapshot diff: change types partition the key space correctly") {
    val rows = EtlOps.q106SnapshotDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(1))
    assert(byType.keySet === Set("insert", "delete", "update"))
    rows.foreach { r =>
      val k = r.getAs[Long]("okey")
      r.getString(1) match {
        case "insert" =>
          assert(k % 7 == 0 && k % 11 != 0)
          assert(r.isNullAt(2) && !r.isNullAt(3))
        case "delete" =>
          assert(k % 11 == 0 && k % 7 != 0)
          assert(!r.isNullAt(2) && r.isNullAt(3))
        case "update" =>
          assert(k % 7 != 0 && k % 11 != 0)
          // repriced urgent orders move by exactly +1.00 (the doubles are
          // exact images of 2-decimal values, so the shortest-repr
          // BigDecimal round-trip recovers the cents exactly)
          assert(BigDecimal(r.getDouble(3)) - BigDecimal(r.getDouble(2))
            === BigDecimal("1.00"))
      }
    }
    // applying the diff to v0 must reconstruct v1 exactly: counts reconcile
    val orders = Tables.load(spark, sf, "orders")
    val n0 = orders.filter(col("o_orderkey") % 7 =!= 0).count()
    val n1 = orders.filter(col("o_orderkey") % 11 =!= 0).count()
    assert(n0 + byType("insert").length - byType("delete").length === n1)
  }

  // ------------------------------------------------ q107 transition matrix
  test("transition matrix: probabilities normalize per from-state; counts reconcile") {
    val rows = EtlOps.q107EventTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val n = rs.map(_.getAs[Long]("n")).sum
      rs.foreach(r =>
        assert(r.getAs[Double]("p") === r.getAs[Long]("n").toDouble / n))
      assert(math.abs(rs.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
    }
    // total transitions = total in-gap adjacent pairs, counted directly
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val direct = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .filter(col("prev").isNotNull && col("tus") - col("prev") <= 1800000000L)
      .count()
    assert(rows.map(_.getAs[Long]("n")).sum === direct)
  }

  // ------------------------------------------------------ q98 sweep line
  test("open-interval sweep: deltas telescope to zero and count stays non-negative") {
    val rows = EtlOps.q98OpenIntervals(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("net")).sum === 0L)
    rows.foreach(r => assert(r.getAs[Long]("open_cnt") >= 0L))
    assert(rows.last.getAs[Long]("open_cnt") === 0L)
  }

  test("open-interval sweep agrees with a direct containment count on a probe day") {
    val rows = EtlOps.q98OpenIntervals(spark, sf).collect()
    // probe the peak day: count intervals [start, end) containing it directly
    val peak = rows.maxBy(_.getAs[Long]("open_cnt"))
    val probe = peak.getAs[java.time.LocalDateTime]("day")
    val direct = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.load(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate").cast("timestamp_ntz") <= lit(probe) &&
        col("l_shipdate").cast("timestamp_ntz") > lit(probe) &&
        col("l_shipdate").cast("timestamp_ntz") > col("o_orderdate").cast("timestamp_ntz"))
      .count()
    assert(peak.getAs[Long]("open_cnt") === direct)
  }

  // ------------------------------------------------------ q114 integrity
  test("integrity audit: clean corpus reports zero violations with full totals") {
    val rows = EtlOps.q114IntegrityAudit(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Long]("n_violations") === 0L))
    val liTotal = rows.find(_.getString(0).startsWith("1_")).get.getAs[Long]("n_total")
    assert(liTotal === Tables.load(spark, sf, "lineitem").count())
  }

  test("integrity audit: injected violations are each counted by their check") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_audit").toString
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      TestSpark.writeSingleFile(df, s"$dir/$name.parquet")
    val li = Tables.load(spark, sf, "lineitem")
    // two orphan lineitems pointing at keys no order has
    stage("lineitem", li.unionByName(
      li.limit(2).withColumn("l_orderkey", -col("l_orderkey") - 1)))
    val ord = Tables.load(spark, sf, "orders")
    // one orphan order
    stage("orders", ord.unionByName(
      ord.limit(1).withColumn("o_custkey", lit(-42L))))
    stage("customer", Tables.load(spark, sf, "customer"))
    val ev = Tables.load(spark, sf, "events")
    // a triple-delivered event id (2 extra rows) and one non-positive value
    stage("events", ev.unionByName(ev.limit(1)).unionByName(ev.limit(1))
      .unionByName(ev.limit(1).withColumn("event_id", lit(-7L))
        .withColumn("value", lit(-1.5))))
    val docs = Tables.load(spark, sf, "documents")
    // one whitespace-only document
    stage("documents", docs.unionByName(docs.limit(1)
      .withColumn("doc_id", lit(-1L)).withColumn("text", lit("   "))))
    val got = EtlOps.q114IntegrityAudit(spark, dir).collect()
      .map(r => r.getString(0).substring(0, 1) -> r.getAs[Long]("n_violations"))
      .toMap
    assert(got === Map("1" -> 2L, "2" -> 1L, "3" -> 2L, "4" -> 1L, "5" -> 1L))
  }

  // ------------------------------------------------------------- q117 IVM
  test("IVM merge: base + delta partitions the rows and totals equal a full recompute") {
    val rows = EtlOps.q117IvmAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_delta") === r.getAs[Long]("n_total"))
    }
    val full = Tables.load(spark, sf, "events")
      .select(col("event_type"), graft.streaming.EventsStream.cents(col("value")).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("sc")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("sc"))).toMap
    rows.foreach { r =>
      val (n, sc) = full(r.getString(0))
      assert(r.getAs[Long]("n_total") === n)
      assert(r.getAs[Double]("sum_value") === sc.toDouble / 100.0)
    }
  }

  test("IVM merge: a delta-only group appears with zero base counts") {
    // cutoff before the data's start: everything is delta, base is empty
    val rows = EtlOps.q117IvmAgg(spark, sf, cutoff = "2000-01-01T00:00:00").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_base") === 0L)
      assert(r.getAs[Long]("n_delta") === r.getAs[Long]("n_total"))
    }
  }

  // ---------------------------------------------------------- q120 attribution
  test("last-touch attribution partitions purchases and matches a brute-force pick") {
    val rows = EtlOps.q120LastTouch(spark, sf).collect()
    val nPurch = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === nPurch)
    // brute-force driver recompute: argmax click ts <= purchase ts per user
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"), expr("ts div 1000").as("tus"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        graft.streaming.EventsStream.cents(col("value")).as("c"))
      .collect()
    val clicksByUser: Map[Long, Seq[(Long, Int)]] = ev.filter(_.getString(0) == "click")
      .groupBy(_.getLong(1)).view
      .mapValues(_.map(r => (r.getLong(2), r.getInt(3))).toSeq.sortBy(_._1)).toMap
    val expect = scala.collection.mutable.Map.empty[Int, (Long, Long)]
      .withDefaultValue((0L, 0L))
    ev.filter(_.getString(0) == "purchase").foreach { p =>
      val (tus, cents) = (p.getLong(2), p.getLong(4))
      val last = clicksByUser.getOrElse(p.getLong(1), Seq.empty)
        .takeWhile(_._1 <= tus).lastOption
      val camp = last match {
        case Some((ct, k)) if tus - ct <= 3600L * 1000000L => k
        case _ => -1
      }
      val (n, s0) = expect(camp); expect(camp) = (n + 1, s0 + cents)
    }
    rows.foreach { r =>
      val (n, s0) = expect(r.getAs[Int]("campaign"))
      assert(r.getAs[Long]("n_purchases") === n)
      assert(r.getAs[Double]("sum_value") === s0.toDouble / 100.0)
    }
    assert(rows.length === expect.size)
  }

  // ------------------------------------------------------------ q123 interp
  test("linear gap-fill: observed hours exact, gaps interpolate the integer line") {
    val rows = EtlOps.q123LinearGapfill(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // dense hourly grid, endpoints observed
      assert(sorted.head.getBoolean(3) && sorted.last.getBoolean(3))
      assert(sorted.map(_.getLong(1)).toSeq ===
        (sorted.head.getLong(1) to sorted.last.getLong(1)).toSeq)
      val obs = sorted.filter(_.getBoolean(3))
        .map(r => r.getLong(1) -> r.getDouble(4))
      sorted.filterNot(_.getBoolean(3)).foreach { r =>
        val h = r.getLong(1)
        val (hp, vp) = obs.takeWhile(_._1 < h).last
        val (hn, vn) = obs.dropWhile(_._1 < h).head
        // driver recompute in the same micro-cent integer arithmetic
        val vpU = math.round(vp * 1e8); val vnU = math.round(vn * 1e8)
        // weak bound (between neighbors) plus exact micro-cent recompute
        assert(r.getDouble(4) >= math.min(vp, vn) - 1e-9, r.toString)
        assert(r.getDouble(4) <= math.max(vp, vn) + 1e-9, r.toString)
        val cpU = vpU / 1000000L; val cnU = vnU / 1000000L
        val exactU = cpU * 1000000L + ((cnU - cpU) * (h - hp) * 1000000L) / (hn - hp)
        assert(math.round(r.getDouble(4) * 1e8) === exactU, r.toString)
      }
    }
  }

  // ------------------------------------------------------------ q122 LTV
  test("cohort LTV: multi-cohort triangle densifies, cumsum telescopes, sizes fixed") {
    import spark.implicits._
    // cohort A (users 1, 2) starts week 10; cohort B (user 3) starts week 11;
    // horizon = week 13. User 2 buys nothing; week 12 is empty for cohort A.
    val ev = Seq(
      (1L, "signup", 10L, 0L), (1L, "purchase", 10L, 1000L),
      (2L, "signup", 10L, 0L), (1L, "purchase", 11L, 500L),
      (3L, "signup", 11L, 0L), (3L, "purchase", 13L, 700L),
      (1L, "purchase", 13L, 300L))
      .toDF("user_id", "event_type", "week", "c")
    val rows = EtlOps.cohortLtv(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // cohort 10 spans ws 0..3, cohort 11 spans ws 0..2 — dense triangles
    assert(rows.keySet === Set((10L, 0L), (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 0L), (11L, 1L), (11L, 2L)))
    assert(rows((10L, 0L)) === ((2L, 10.0, 10.0, 5.0)))
    assert(rows((10L, 1L)) === ((2L, 5.0, 15.0, 7.5)))
    assert(rows((10L, 2L)) === ((2L, 0.0, 15.0, 7.5))) // empty week carried
    assert(rows((10L, 3L)) === ((2L, 3.0, 18.0, 9.0)))
    assert(rows((11L, 0L)) === ((1L, 0.0, 0.0, 0.0)))
    assert(rows((11L, 2L)) === ((1L, 7.0, 7.0, 7.0)))
  }

  // ------------------------------------------------------------ q165 ivm join
  test("ivm join: base + delta refresh equals the full join recompute") {
    val got = EtlOps.q165IvmJoin(spark, sf)
    val full = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_full"),
        round(sum(col("l_extendedprice").cast(DecimalType(12, 4)) *
          (lit(1.0) - col("l_discount")).cast(DecimalType(12, 4))), 2)
          .cast("double").as("rev_full"))
    val j = got.join(full, Seq("o_orderpriority"), "full_outer")
    assert(j.filter(col("n_total") =!= col("n_full")).count() === 0)
    assert(j.filter(col("revenue") =!= col("rev_full")).count() === 0)
    assert(j.filter(col("n_total").isNull || col("n_full").isNull).count() === 0)
    // the base/delta split partitions every joined row exactly once
    assert(got.filter(col("n_base") + col("n_delta") =!= col("n_total")).count() === 0)
    // both sides of the decomposition carry real weight at this cutoff
    assert(got.agg(sum("n_delta")).head.getLong(0) > 0)
    assert(got.agg(sum("n_base")).head.getLong(0) > 0)
  }

  // ------------------------------------------------------------ q119 WoW
  test("WoW movers: deltas reconcile with the weekly sums and weeks are consecutive") {
    val rows = EtlOps.q119WowMovers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Double]("sum_value") - r.getAs[Double]("prev_value")
      assert(math.abs(d - r.getAs[Double]("delta")) < 1e-9)
    }
    // ranked by |delta| non-increasing
    val deltas = rows.map(r => math.abs(r.getAs[Double]("delta")))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  // ------------------------------------------------------------ q130 TWAP
  test("TWAP equals the hand integral; count-mean diverges on a burst") {
    import spark.implicits._
    // value 10.0 holds for 90 us, then a 3-read burst at 100.0 for 10 us:
    // TWAP = (1000c*90 + 10000c*(4+3+3)) / 100us / 100 = 19.0; the count
    // mean (10+100*3)/4 = 77.5 is the artifact TWAP exists to avoid
    val ev = Seq(
      (1L, 0L, 10.0, 101L), (2L, 90000L, 100.0, 101L),
      (3L, 94000L, 100.0, 101L), (4L, 97000L, 100.0, 101L),
      (5L, 100000L, 50.0, 101L), // last obs: zero weight
      (6L, 0L, 5.0, 202L))       // single obs: excluded (no span)
      .map { case (id, tus, v, u) => (id, tus * 1000L, u, "x", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_twap").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EtlOps.q130Twap(spark, dir).collect()
    assert(r.length === 1 && r.head.getAs[Long]("user_id") === 101L)
    assert(r.head.getAs[Long]("n_obs") === 5L)
    assert(r.head.getAs[Long]("span_us") === 100000L)
    val expect = (1000.0 * 90000 + 10000.0 * (4000 + 3000 + 3000)) / 100000 / 100
    assert(r.head.getAs[Double]("twap") === expect)
  }

  // ------------------------------------------------------------ q131 bands
  test("percentile bands: spot cell matches the dyadic interpolation by hand") {
    val bands = EtlOps.q131PercentileBands(spark, sf)
    val cell = bands.orderBy(col("n").desc, col("event_type"), col("hour")).head()
    val (ty, hr) = (cell.getString(0), cell.getLong(1))
    val vs = Tables.load(spark, sf, "events")
      .filter(col("event_type") === ty &&
        expr("(ts div 1000) div 3600000000") === hr)
      .select((col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    def q(f: Double): Double = {
      val h = (vs.length - 1) * f
      val lo = h.toInt
      val frac = h - lo
      (vs(lo) + (if (frac > 0) (vs(lo + 1) - vs(lo)) * frac else 0.0)) / 100.0
    }
    assert(cell.getAs[Long]("n") === vs.length.toLong)
    assert(cell.getAs[Double]("p50") === q(0.5))
    assert(cell.getAs[Double]("p9375") === q(0.9375))
  }

  // ------------------------------------------------------------ q132 lift
  test("basket lift: top pair recomputable from raw baskets; identities hold") {
    val rows = EtlOps.q132BasketLift(spark, sf).collect()
    assert(rows.nonEmpty)
    val baskets = Tables.load(spark, sf, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nUsers = baskets.map(_._1).distinct.length
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val ua = baskets.filter(_._2 == a).map(_._1).toSet
      val ub = baskets.filter(_._2 == b).map(_._1).toSet
      val nab = (ua & ub).size.toLong
      assert(r.getAs[Long]("n_a") === ua.size.toLong)
      assert(r.getAs[Long]("n_ab") === nab)
      assert(r.getAs[Double]("support") === nab.toDouble / nUsers)
      assert(r.getAs[Double]("lift") ===
        (nab.toDouble * nUsers) / (ua.size.toDouble * ub.size))
    }
  }

  // ------------------------------------------------------------ q133 EWMA
  test("EWMA: constant series is a fixpoint; short-head renormalizes by hand") {
    import spark.implicits._
    val mk = (id: Long, tus: Long, v: Double, u: Long) =>
      (id, tus * 1000L, u, "x", v, "{}")
    val ev = (Seq.tabulate(20)(i => mk(i.toLong, i.toLong * 10, 7.25, 1L)) ++
      Seq(mk(100L, 0L, 1.0, 2L), mk(101L, 10L, 2.0, 2L), mk(102L, 20L, 4.0, 2L)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_ewma").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EtlOps.q133EwmaSmooth(spark, dir).collect()
    // constant series: exact fixpoint — num = vc·W and den = W are both
    // under 2^53, so num/den/100 reproduces the constant exactly
    r.filter(_.getAs[Long]("user_id") == 1L).foreach { row =>
      assert(row.getAs[Double]("ewma") === 7.25)
    }
    // short head, by hand: c_k = 2^(15-k), renormalized over present lags,
    // CENT-QUANTIZED (trunc num/den — the r11 contract: the cent grid is
    // the widest export both engines cast to double identically)
    val c = (0 until 16).map(k => BigInt(1) << (15 - k))
    val u2 = r.filter(_.getAs[Long]("user_id") == 2L)
      .sortBy(_.getAs[Long]("tus")).map(_.getAs[Double]("ewma"))
    def hand(vsCents: Seq[Long]): Double = {
      val num = vsCents.reverse.zipWithIndex.map { case (v, k) => BigInt(v) * c(k) }.sum
      val den = vsCents.indices.map(c(_)).sum
      (num / den).toDouble / 100.0
    }
    assert(u2(0) === hand(Seq(100L)))
    assert(u2(1) === hand(Seq(100L, 200L)))
    assert(u2(2) === hand(Seq(100L, 200L, 400L)))
    // one output row per event, no drops at series heads
    assert(r.count(_.getAs[Long]("user_id") == 1L) === 20)
  }

  // ------------------------------------------------------------ q138 debounce
  test("debounce: bursts collapse to their head with count and span; singles pass through") {
    import spark.implicits._
    val mk = (id: Long, sec: Long, ty: String) =>
      (id, sec * 1000000000L, 5L, ty, 1.0, "{}")
    // clicks: burst of 3 (0s, 100s, 250s chain at 300s gap), then solo at 1000s
    val ev = Seq(mk(1, 0, "click"), mk(2, 100, "click"), mk(3, 250, "click"),
      mk(4, 1000, "click"), mk(5, 0, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_debounce").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EtlOps.q138Debounce(spark, dir).collect()
    val clicks = r.filter(_.getString(1) == "click")
    assert(clicks.length === 2)
    assert(clicks.head.getAs[Long]("event_id") === 1L)
    assert(clicks.head.getAs[Long]("n_collapsed") === 3L)
    assert(clicks.head.getAs[Long]("span_us") === 250000000L)
    assert(clicks(1).getAs[Long]("event_id") === 4L)
    assert(clicks(1).getAs[Long]("n_collapsed") === 1L)
    assert(r.count(_.getString(1) == "view") === 1)
    // conservation: collapsed counts cover every event exactly once
    assert(r.map(_.getAs[Long]("n_collapsed")).sum === 5L)
  }

  // ------------------------------------------------------------ q134 IVM
  test("IVM moments: merged partials equal the single-pass recompute; var matches var_samp to grid") {
    val got = EtlOps.q134IvmMoments(spark, sf)
    // single-pass recompute (no base/delta split), same closed formula
    val cents = graft.streaming.EventsStream.cents(col("value"))
    val full = Tables.load(spark, sf, "events")
      .select(col("event_type"), cents.as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("s2"))
      .select(col("event_type"), col("n"),
        (col("sc").cast("double") / col("n").cast("double") / 100.0).as("mean_value"),
        when(col("n") > 1,
          expr("(n * s2 - cast(sc as decimal(38,0)) * sc) div (n * (n - 1))"))
          .as("var_cents2"))
      .withColumn("var_value", col("var_cents2").cast("double") / 10000.0)
      .withColumn("stddev_value", sqrt(col("var_value")))
      .orderBy("event_type")
    assert(got.collect().map(_.toSeq).toSeq === full.collect().map(_.toSeq).toSeq)
    // the integer-grid variance sits within one grid step of float var_samp
    val ref = Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(var_samp(col("value")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.collect().foreach { r =>
      if (!r.isNullAt(r.fieldIndex("var_value")))
        assert(math.abs(r.getAs[Double]("var_value") - ref(r.getString(0))) < 1e-2)
    }
  }

  // ------------------------------------------------------------ q135 late
  test("nearest-event join: planted ties pick earlier-then-larger-id; no-match stays null") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 100L, 101L), // equidistant purchases both sides
      (2L, 100L, 102L), // two purchases at the same instant
      (3L, 100L, 103L)  // no purchase at all
    ).toDF("user_id", "tus", "click_id")
    val purch = Seq(
      (1L, 90L, 11L), (1L, 110L, 12L),  // dist 10 both ways -> earlier wins
      (2L, 95L, 21L), (2L, 95L, 22L)    // same tus -> larger id wins
    ).map { case (u, t2, id) => (u, t2, t2, id) }
      .toDF("user_id", "tus", "p_tus", "p_id")
    val got = EtlOps.nearestEvent(clicks, purch)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(101L) === ((Some(11L), Some(90L), Some(10L))))
    assert(got(102L) === ((Some(22L), Some(95L), Some(5L))))
    assert(got(103L) === ((None, None, None)))
  }

  test("late-data audit: hand-built reordering yields exact lateness and counts") {
    import spark.implicits._
    // partition 0 (ids 0,8,16,24): times 100s, 50s (late 50s), 200s, 199s
    val ev = Seq(
      (0L, 100L), (8L, 50L), (16L, 200L), (24L, 199L),
      (1L, 10L), (9L, 10L)) // partition 1: never late
      .map { case (id, sec) => (id, sec * 1000000L * 1000L, 1L, "t", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EtlOps.q135LateDataAudit(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n") === 6L)
    // late events: id 8 (50s behind), id 24 (1s behind)
    assert(row.getAs[Long]("max_late_us") === 50000000L)
    assert(row.getAs[Long]("n_late_1m") === 0L)  // 50s < 1m
    // tighten: a 30s delay would drop id 8 — verify via raw lateness
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("event_id"), lit(8))).orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val lates = Tables.load(spark, dir, "events")
      .withColumn("late", greatest(coalesce(
        max(expr("ts div 1000")).over(w) - expr("ts div 1000"), lit(0L)), lit(0L)))
      .filter(col("late") > 0).select("event_id", "late").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(lates === Map(8L -> 50000000L, 24L -> 1000000L))
  }

  // ------------------------------------------------------------ q124 PIT
  test("PIT join equals the explicit interval-join form") {
    import org.apache.spark.sql.expressions.Window
    val cents = graft.streaming.EventsStream.cents _
    val ntz = (c: org.apache.spark.sql.Column) => c.cast("timestamp_ntz")
    val o = Tables.load(spark, sf, "orders").filter(col("o_custkey") % 20 === 1)
    val w = Window.partitionBy("custkey").orderBy("pit_ts")
    val hist = o
      .groupBy(col("o_custkey").as("custkey"), ntz(col("o_orderdate")).as("pit_ts"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("eff"))
      .select(col("custkey"), col("pit_ts"), col("eff.o_totalprice").as("state_price"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("pit_ts"), 1).over(w))
    val facts = Tables.load(spark, sf, "lineitem")
      .join(o.select(col("o_orderkey"), col("o_custkey").as("custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("custkey").as("f_custkey"), ntz(col("l_shipdate")).as("f_ts"),
        cents(col("l_quantity")).as("qc"), cents(col("l_extendedprice")).as("pc"))
    // the naive tiling-interval join the as-of pass replaces
    val brute = facts.join(hist,
        col("f_custkey") === col("custkey") && col("f_ts") >= col("pit_ts") &&
          (col("valid_to").isNull || col("f_ts") < col("valid_to")))
      .groupBy("custkey", "version")
      .agg(max(col("state_price")).as("state_price"), count(lit(1)).as("n_items"),
        (sum(col("qc")).cast("double") / 100.0).as("sum_qty"),
        (sum(col("pc")).cast("double") / 100.0).as("revenue"))
      .orderBy("custkey", "version")
    val got = ops.EtlOps.q124PitJoin(spark, sf)
    assert(got.collect().map(_.toSeq).toSeq === brute.collect().map(_.toSeq).toSeq)
    // every fact at/after its key's first version is attributed exactly once;
    // facts before any version existed are excluded (standard PIT contract)
    val firstV = hist.groupBy(col("custkey").as("f_custkey"))
      .agg(min(col("pit_ts")).as("v0"))
    val inEffect = facts.join(firstV, "f_custkey").filter(col("f_ts") >= col("v0"))
    assert(got.agg(sum("n_items")).head.getLong(0) === inEffect.count())
    assert(inEffect.count() < facts.count()) // the excluded band is non-empty here
  }

  test("rolling actives: sweep-line equals the brute-force range join") {
    val p = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val days = p.select("day").distinct()
    val brute = days.as("d").join(p.as("p"),
        col("p.day").between(col("d.day") - 6, col("d.day")))
      .groupBy(col("d.day").as("day"))
      .agg(countDistinct(col("p.user_id")).as("wau7_brute"))
    val got = EtlOps.q142RollingActives(spark, sf)
    assert(got.count() === days.count())
    val joined = got.join(brute, "day")
    assert(joined.filter(col("wau7") =!= col("wau7_brute")).count() === 0)
    // dau can never exceed the window count
    assert(got.filter(col("dau") > col("wau7")).count() === 0)
  }

  // ------------------------------------------------------------ q162 funnel
  test("funnel curve: windowed stages and day buckets match a driver recompute") {
    import spark.implicits._
    val got = EtlOps.q162FunnelCurve(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val day = 86400000000L
    val hor = 7 * day
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val sign = byUser.flatMap { case (u, es) =>
      val ss = es.filter(_._2 == "signup").map(_._3)
      if (ss.isEmpty) None else Some(u -> ss.min)
    }
    val click = sign.flatMap { case (u, ts) =>
      val cs = byUser(u).filter(e => e._2 == "click" && e._3 >= ts && e._3 < ts + hor)
      if (cs.isEmpty) None else Some(u -> ((ts, cs.map(_._3).min)))
    }
    val purch = click.flatMap { case (u, tc) =>
      val ps = byUser(u)
        .filter(e => e._2 == "purchase" && e._3 >= tc._2 && e._3 < tc._2 + hor)
      if (ps.isEmpty) None else Some(u -> ((tc._2, ps.map(_._3).min)))
    }
    def check(spans: Iterable[(Long, Long)], stage: String): Unit = {
      val bucket = spans.groupBy { case (from, to) => (to - from) / day }
        .view.mapValues(_.size.toLong).toMap
      var cum = 0L
      (0L until 7L).foreach { k =>
        val n = bucket.getOrElse(k, 0L); cum += n
        assert(got((stage, k)) === ((n, cum)), s"$stage day $k")
      }
    }
    check(click.values, "click")
    check(purch.values, "purchase")
    assert(click.nonEmpty && purch.nonEmpty) // both stages exercised
  }

  // ------------------------------------------------------------ q156 paths
  test("session paths: counts and head match a driver-side trigram recompute") {
    import spark.implicits._
    val got = EtlOps.q156SessionPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"),
        col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val counts = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._3, r._4)).map(_._2)
        .sliding(3).filter(_.length == 3).map(_.mkString(" > "))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = counts.values.sum.toDouble
    got.foreach { case (path, n, share) =>
      assert(counts(path) === n, path)
      assert(share === n / tot)
    }
    val expTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq === expTop)
  }

  // ------------------------------------------------------------ q155 cusum
  test("cusum change-point matches a driver-side BigInt recompute") {
    val got = EtlOps.q155CusumChangepoint(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val rows = Tables.load(spark, sf, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = rows.groupBy(_._1)
    assert(got.keySet === byType.keySet)
    byType.foreach { case (tpe, rs) =>
      val daily = rs.groupBy(_._2).view.mapValues(_.map(v => BigInt(v._3)).sum)
        .toSeq.sortBy(_._1)
      val n = BigInt(daily.length)
      val tot = daily.map(_._2).sum
      var pre = BigInt(0)
      var best = (BigInt(-1), 0L)
      daily.zipWithIndex.foreach { case ((day, dc), i) =>
        pre += dc
        val cu = (n * pre - tot * BigInt(i + 1)).abs
        if (cu > best._1) best = (cu, day) // ascending days: ties keep earliest
      }
      val (nDays, changeDay, cusumAbs) = got(tpe)
      assert(nDays === daily.length.toLong, tpe)
      assert(changeDay === best._2, tpe)
      assert(cusumAbs === best._1.toLong, tpe)
    }
  }

  test("rolling actives: coverage window expires after exactly 7 days") {
    import spark.implicits._
    val us = 86400000000L // one day of microseconds
    val ev = Seq(
      (1L, 0L), (1L, 10L), // user 1: days 0 and 10 — gap breaks coverage
      (2L, 3L)             // user 2: day 3 only
    ).map { case (u, day) => (u, day * us * 1000L, s"e$u-$day") }
      .toDF("user_id", "ts", "event_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_wau").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EtlOps.q142RollingActives(spark, tmp)
      .select("day", "dau", "wau7").as[(Long, Long, Long)].collect()
      .map { case (d, a, w) => d -> ((a, w)) }.toMap
    assert(got(0L) === ((1L, 1L)))  // day 0: only user 1
    assert(got(3L) === ((1L, 2L)))  // day 3: user 2 active, user 1 still covered
    assert(got(10L) === ((1L, 1L))) // day 10: user 1's new interval; day-3 expired day 9
  }

  // ------------------------------------------------------------ q180 fd
  test("FD audit matches a driver-side recompute and certifies the key FD") {
    val got = EtlOps.q180FdAudit(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(got.keySet.size === 6)
    // n_nationkey is the table key: the FD must hold with zero violations
    val nat = got("nation.n_nationkey->n_regionkey")
    assert(nat._5 && nat._2 === 0L && nat._3 === 0L && nat._4 === 1L)
    // independent recompute of a data-bearing candidate
    val rows = Tables.load(spark, TestSpark.sf, "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val g = rows.groupBy(_._1).view
      .mapValues(v => (v.map(_._2).distinct.size.toLong, v.size.toLong)).toMap
    val exp = (g.size.toLong, g.values.count(_._1 > 1).toLong,
      g.values.filter(_._1 > 1).map(_._2).sum,
      g.values.map(_._1).max, g.values.forall(_._1 <= 1))
    assert(got("documents.source->lang") === exp)
  }

  test("multi-touch attribution conserves credit and revenue mass exactly") {
    val rows = EtlOps.q215MultitouchAttribution(spark, TestSpark.sf).collect()
    val purchases = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase")
      .select(graft.streaming.EventsStream.cents(col("value")).as("c"))
      .collect().map(_.getLong(0))
    // Σ credit ≡ 10^6 per purchase — the integer-split invariant
    assert(rows.map(_.getAs[Long]("credit_micro")).sum ===
      1000000L * purchases.length)
    // Σ attributed revenue ≡ 10^6 × Σ purchase cents
    val totalRev = rows.map(r => BigInt(r.getAs[String]("rev_micro_cents"))).sum
    assert(totalRev === BigInt(1000000L) * purchases.map(BigInt(_)).sum)
    // organic bucket present, campaigns disjoint and sorted
    assert(rows.head.getAs[Int]("campaign") === -1)
    val camps = rows.map(_.getAs[Int]("campaign")).toSeq
    assert(camps === camps.sorted && camps.distinct.length === camps.length)
  }

  test("sequential rules equal a per-user ordered-occurrence brute force") {
    val rows = EtlOps.q216SeqRules(spark, TestSpark.sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("support"), r.getAs[Long]("ante_support"),
          r.getAs[Long]("confidence_bp")))).toMap
    // brute force: per user, A->B iff some A-occurrence precedes some B
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val types = ev.map(_._2).distinct
    val anteSup = types.map(t => t -> byUser.count(_._2.exists(_._2 == t)).toLong).toMap
    for (a <- types; b <- types if a != b) {
      val sup = byUser.count { case (_, rs) =>
        val as = rs.filter(_._2 == a).map(_._3)
        val bs = rs.filter(_._2 == b).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max
      }.toLong
      if (sup > 0) {
        val (gs, ga, gc) = rows((a, b))
        assert((gs, ga) === ((sup, anteSup(a))), s"$a->$b")
        assert(gc === 10000L * sup / anteSup(a))
        assert(gc <= 10000L)
      } else assert(!rows.contains((a, b)))
    }
  }

  test("q247 secondary sort equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = ops.EtlOps.q247SecondarySort(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val twin = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .withColumn("reset",
        when(col("c") > lag("c", 1).over(w), 0L).otherwise(1L))
      .withColumn("run_id", sum("reset").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "run_id").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(sum("len").as("n_events"),
        max("len").as("longest_run"))
      .orderBy("user_id").collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq === twin.toSeq)
  }

  test("q248 accumulators agree with the exact aggregate and re-invoke cleanly") {
    val r1 = ops.EtlOps.q248AccumulatorAudit(spark, TestSpark.sf).collect().head
    val r2 = ops.EtlOps.q248AccumulatorAudit(spark, TestSpark.sf).collect().head
    assert(r1.toSeq === r2.toSeq) // fresh accumulators per invocation
    val direct = Tables.load(spark, TestSpark.sf, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(count(lit(1)), sum(when(pmod(col("k"), lit(7L)) === 0L, 1L)
        .otherwise(0L)), sum("k")).collect().head
    assert(r1.toSeq === direct.toSeq)
  }
}
