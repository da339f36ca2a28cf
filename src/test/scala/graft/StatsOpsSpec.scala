package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{SimilarityOps, StatsOps}

class StatsOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("percentiles are ordered p25 <= p50 <= p75 <= p90") {
    val bad = StatsOps.q45Percentiles(spark, sf)
      .filter(col("p25") > col("p50") || col("p50") > col("p75") || col("p75") > col("p90"))
    assert(bad.count() === 0)
  }

  test("approx_count_distinct within 2% of exact") {
    val approx = StatsOps.q52ApproxDistinct(spark, sf)
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val joined = approx.join(exact, "l_returnflag")
      .withColumn("err", abs(col("approx_parts") - col("exact_parts")) / col("exact_parts"))
    assert(joined.filter(col("err") > 0.02).count() === 0)
  }

  test("UDAF stats agree with built-in aggregates") {
    val udafOut = StatsOps.q50Udaf(spark, sf)
    val builtin = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("c"), sum("l_quantity").as("s"),
        min("l_quantity").as("mn"), max("l_quantity").as("mx"))
    val diff = udafOut.join(builtin, "l_returnflag")
      .filter(col("n_rows") =!= col("c") || col("sum_qty") =!= col("s") ||
        col("min_qty") =!= col("mn") || col("max_qty") =!= col("mx"))
    assert(diff.count() === 0)
  }

  test("pivot cells sum to the group totals") {
    val p = StatsOps.q48Pivot(spark, sf)
      .withColumn("total", col("F") + col("O") + col("P"))
    val g = Tables.load(spark, sf, "orders").groupBy("o_orderpriority").count()
    val diff = p.join(g, "o_orderpriority").filter(col("total") =!= col("count"))
    assert(diff.count() === 0)
  }

  test("native cosine expression == composed higher-order form") {
    val native = SimilarityOps.q53CosineTopKNative(spark, sf).collect()
    val composed = SimilarityOps.q40CosineTopK(spark, sf).collect()
    assert(native.map(_.toSeq).toSeq === composed.map(_.toSeq).toSeq)
  }

  test("graft_cosine accepts raw float embeddings in SQL (builder inserts the cast)") {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    val self = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM embeddings LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("native cosine survives codegen (no fallback errors) and scores correctly") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 0.0), Array(0.0, 5.0))).toDF("a", "b")
      .withColumn("cos", call_function("graft_cosine", col("a"), col("b")))
    val vals = df.select("cos").as[Double].collect()
    assert(math.abs(vals(0) - 1.0) < 1e-12)
    assert(math.abs(vals(1)) < 1e-12)
  }

  test("robust outliers: median/MAD agree with a driver-side computation") {
    val rows = StatsOps.q103RobustOutliers(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byType = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_type"), graft.streaming.EventsStream.cents(col("value")).as("c"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    def medOf(xs: Array[Long]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2).toDouble else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      assert(r.getAs[Long]("n") === xs.length)
      val med = medOf(xs)
      assert(r.getAs[Double]("med") === med / 100.0)
      // adev values are integer-or-half-integer; recompute in doubles
      val madD = {
        val devs = xs.map(x => math.abs(x - med)).sorted
        val n = devs.length
        if (n % 2 == 1) devs(n / 2) else (devs(n / 2 - 1) + devs(n / 2)) / 2.0
      }
      assert(r.getAs[Double]("mad") === madD / 100.0)
      val nOut = xs.count(x => math.abs(x - med) > 4.4478 * madD)
      assert(r.getAs[Long]("n_outliers") === nOut)
    }
  }

  test("chi-square: full grid incl. zero cells, contributions recompute, total telescopes") {
    val rows = StatsOps.q104ChiSquare(spark, TestSpark.sf).collect()
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val nLang = docs.select("lang").distinct().count()
    val nSrc = docs.select("source").distinct().count()
    assert(rows.length === nLang * nSrc)
    // sf0.001 has at least one structurally-missing cell — it must appear as o=0
    assert(rows.exists(_.getAs[Long]("o") === 0L))
    assert(rows.map(_.getAs[Long]("o")).sum === docs.count())
    val total = rows.head.getAs[Double]("chi2_total")
    rows.foreach(r => assert(r.getAs[Double]("chi2_total") === total))
    val sumContrib = BigDecimal(rows.map(r => BigDecimal(r.getAs[Double]("contrib"))).sum
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(sumContrib === BigDecimal(total))
  }

  test("Misra-Gries: survivors form a superset of every item above n/(cap+1)") {
    // skewed stream: item i appears 2^i times, shuffled deterministically
    val stream = new scala.util.Random(7)
      .shuffle((0 to 9).flatMap(i => Seq.fill(1 << i)(s"item$i")).toVector)
    val n = stream.length // 1023
    for (cap <- Seq(3, 7, 15)) {
      val survivors = StatsOps.misraGries(stream.iterator, cap).toSet
      assert(survivors.size <= cap)
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      counts.foreach { case (item, c) =>
        if (c > n / (cap + 1)) assert(survivors.contains(item), s"cap=$cap $item")
      }
    }
  }

  test("heavy hitters: sketch-pruned plan equals the exact GROUP BY / HAVING answer") {
    val got = StatsOps.q110HeavyHitters(spark, sf).collect()
    assert(got.nonEmpty)
    val tok = Tables.load(spark, sf, "documents")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
    val n = tok.count()
    val expect = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * StatsOps.hhShareDenom > n)
      .orderBy(col("cnt").desc, col("token")).collect()
    assert(got.length === expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g.getString(0) === e.getString(0))
      assert(g.getAs[Long]("cnt") === e.getAs[Long]("cnt"))
      assert(g.getAs[Double]("share") === e.getAs[Long]("cnt").toDouble / n)
    }
  }

  // ------------------------------------------------------------ q115 drift
  test("JS drift: bounded by ln 2, contribs sum to the total, matches a driver recompute") {
    val rows = StatsOps.q115DistributionDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val js = rows.head.getAs[Double]("js_total")
    assert(rows.forall(_.getAs[Double]("js_total") === js))
    assert(js >= 0.0 && js <= math.log(2.0))
    assert(math.abs(rows.map(_.getAs[Double]("contrib")).sum - js) < 1e-9)
    // free-form double recompute (no 6-dp pinning) should land within the
    // pinning error budget: |langs| terms × 0.5e-6 max rounding each
    val counts = Tables.load(spark, sf, "documents")
      .select(col("lang"), graft.ops.TextOps.splitAssign(col("text")).as("s"))
      .collect().groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.size.toDouble).toMap
    val langs = counts.keys.map(_._1).toSet
    val ta = counts.collect { case ((_, "train"), n) => n }.sum
    val tb = counts.collect { case ((_, "eval"), n) => n }.sum
    val free = langs.toSeq.map { l =>
      val p = counts.getOrElse((l, "train"), 0.0) / ta
      val q = counts.getOrElse((l, "eval"), 0.0) / tb
      val m = (p + q) / 2
      (if (p > 0) p * math.log(p / m) else 0.0) / 2 +
        (if (q > 0) q * math.log(q / m) else 0.0) / 2
    }.sum
    assert(math.abs(free - js) < langs.size * 1e-6)
  }

  // ------------------------------------------------------------ q121 bootstrap
  test("Poisson bootstrap: replica sizes concentrate at n and SE tracks sd/sqrt(n)") {
    val rows = StatsOps.q121BootstrapSe(spark, sf).collect()
    assert(rows.length === 32)
    val se = rows.head.getAs[Double]("se_value")
    assert(rows.forall(_.getAs[Double]("se_value") === se))
    val vals = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(graft.streaming.EventsStream.cents(col("value")))
      .collect().map(_.getLong(0).toDouble / 100.0)
    val n = vals.length
    // Poisson(1) multiplicities: replica size within 20% of n at n ~ 200
    rows.foreach(r => assert(math.abs(r.getAs[Long]("n_eff") - n) < n * 0.2))
    val mean = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    val analytic = sd / math.sqrt(n.toDouble)
    assert(se > analytic * 0.5 && se < analytic * 2.0,
      s"bootstrap se=$se vs analytic=$analytic")
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("mean_value") - mean) < 5 * analytic))
  }

  // ------------------------------------------------------------ q116 clip
  test("IQR clip: fences ordered and clip counts/winsorized sum match a driver recompute") {
    val rows = StatsOps.q116IqrClip(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fence_lo") <= r.getAs[Double]("q1"))
      assert(r.getAs[Double]("q1") <= r.getAs[Double]("q3"))
      assert(r.getAs[Double]("q3") <= r.getAs[Double]("fence_hi"))
    }
    val byType = Tables.load(spark, sf, "events")
      .select(col("event_type"), graft.streaming.EventsStream.cents(col("value")).as("c"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      assert(r.getAs[Long]("n") === xs.length.toLong)
      def quart(p: Double): Double = { // lo + f·(hi−lo) on the sorted cents
        val pos = p * (xs.length - 1)
        val i = pos.toInt
        val f = pos - i
        xs(i) + f * (xs(math.min(i + 1, xs.length - 1)) - xs(i))
      }
      val (q1, q3) = (quart(0.25), quart(0.75))
      val iqr = q3 - q1
      val (lo, hi) = (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
      assert(r.getAs[Long]("n_clip_lo") === xs.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_clip_hi") === xs.count(_ > hi).toLong)
      val winsor = xs.map(v => math.max(lo, math.min(hi, v.toDouble))).sum
      assert(math.abs(r.getAs[Double]("sum_winsorized") - winsor / 100.0) < 1e-6)
    }
  }

  test("column entropy: constant column ~0, uniform column ~ln(k), bounds hold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_entropy").toString
    Seq.tabulate(8)(i => (i.toLong, s"t$i", "en", s"src${i % 4}", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.tabulate(8)(i => (i.toLong, if (i % 2 == 0) "click" else "view"))
      .toDF("event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = StatsOps.q129ColumnEntropy(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(math.abs(r("documents.lang").getAs[Double]("entropy_nats")) < 1e-9)
    assert(r("documents.lang").getAs[Long]("n_distinct") === 1L)
    assert(math.abs(r("documents.source").getAs[Double]("entropy_nats")
      - math.log(4)) < 1e-5)
    assert(math.abs(r("events.event_type").getAs[Double]("entropy_nats")
      - math.log(2)) < 1e-5)
    // the real tables: 0 <= H <= ln(n_distinct) for every profiled column
    StatsOps.q129ColumnEntropy(spark, TestSpark.sf).collect().foreach { row =>
      val h = row.getAs[Double]("entropy_nats")
      assert(h >= -1e-9 &&
        h <= math.log(row.getAs[Long]("n_distinct").toDouble) + 1e-6)
    }
  }

  test("kmv sketch: below-capacity groups are exact, estimates track truth") {
    val rows = StatsOps.q141KmvSketch(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_distinct")
      val est = r.getAs[Long]("est_distinct")
      if (exact < 64) assert(est === exact)             // sketch is lossless
      else assert(est > exact / 3 && est < exact * 3)   // ~1/sqrt(64) regime
    }
  }

  // ------------------------------------------------------------ q157 a/b
  test("a/b experiment: counts, rates, and z2 match a driver recompute") {
    val r = StatsOps.q157AbExperiment(spark, TestSpark.sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (nA, xA, nB, xB) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // driver recompute of the per-user conversion + md5 arm split
    val users = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("event_type")).as[(Long, String)].collect()
      .groupBy(_._1).iterator.map { case (u, evs) =>
        val conv = if (evs.exists(_._2 == "purchase")) 1L else 0L
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
        val arm = if (((md(0) >> 4) & 0xf) < 8) "A" else "B"
        (arm, conv)
      }.toSeq
    assert(nA === users.count(_._1 == "A").toLong)
    assert(xA === users.filter(_._1 == "A").map(_._2).sum)
    assert(nB === users.count(_._1 == "B").toLong)
    assert(xB === users.filter(_._1 == "B").map(_._2).sum)
    // z2 equals the same fixed IEEE tree evaluated on the driver
    val (ra, rb) = (xA.toDouble / nA, xB.toDouble / nB)
    val pooled = (xA + xB).toDouble / (nA + nB)
    val den = pooled * (1.0 - pooled) * (1.0 / nA + 1.0 / nB)
    assert(row.getDouble(4) === ra && row.getDouble(5) === rb)
    if (den > 0.0) assert(row.getDouble(7) === (ra - rb) * (ra - rb) / den)
    else assert(row.isNullAt(7))
  }

  test("kmv sketch merges: min-k of union == min-k over re-unioned halves") {
    // the mergeability claim behind the scale argument, on the real corpus:
    // splitting the table in half, taking each half's k smallest hashes,
    // unioning those SKETCHES and re-taking k smallest must equal the
    // whole-table sketch (so partial aggregation is lossless)
    import org.apache.spark.sql.expressions.Window
    val k = 64
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val h = docs.select(col("lang"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("h"))
      .distinct()
    val w = Window.partitionBy("lang").orderBy("h")
    def minK(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
    val whole = minK(h).as[(String, String)].collect().toSet
    val half1 = minK(h.filter(col("h") < "8"))
    val half2 = minK(h.filter(col("h") >= "8"))
    val merged = minK(half1.union(half2)).as[(String, String)].collect().toSet
    assert(merged === whole)
  }

  // ------------------------------------------------------------ q166
  test("sketch quantiles: exact side matches brute order statistics, " +
    "estimates come from the sample, and re-sharding changes nothing") {
    val got = StatsOps.q166SketchQuantiles(spark, TestSpark.sf)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // brute exact order statistics per lang (sf0.001 is collectable)
    val byLang = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("lang"), col("n_chars")).as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    rows.foreach { r =>
      val vs = byLang(r.getAs[String]("lang"))
      val n = vs.length
      assert(r.getAs[Long]("n_docs") === n.toLong)
      def exa(p: Int): Long = vs((p * n + 99) / 100 - 1)
      assert(r.getAs[Long]("exa_p25") === exa(25))
      assert(r.getAs[Long]("exa_p50") === exa(50))
      assert(r.getAs[Long]("exa_p90") === exa(90))
      // estimates are real member values within the group's range
      Seq("est_p25", "est_p50", "est_p90").foreach { c =>
        val v = r.getAs[Long](c)
        assert(vs.contains(v) && v >= vs.head && v <= vs.last)
      }
      // monotone in p
      assert(r.getAs[Long]("est_p25") <= r.getAs[Long]("est_p50"))
      assert(r.getAs[Long]("est_p50") <= r.getAs[Long]("est_p90"))
    }
    // re-shard determinism: a 7-way repartitioned copy of the table must
    // produce the identical sketch (hash order, not partition order)
    val dir = java.nio.file.Files.createTempDirectory("graft_qsketch").toString
    Tables.load(spark, TestSpark.sf, "documents").repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val reshard = StatsOps.q166SketchQuantiles(spark, dir).collect()
    assert(reshard.toSeq === rows.toSeq)
  }

  // ------------------------------------------------------------ q167
  test("corr matrix: certificate reconstructs Spark's own corr()") {
    val rows = StatsOps.q167CorrMatrix(spark, TestSpark.sf).collect()
    assert(rows.length === StatsOps.corrPairs.length)
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val raw = Map("quantity" -> "l_quantity", "extendedprice" -> "l_extendedprice",
      "discount" -> "l_discount", "tax" -> "l_tax")
    rows.foreach { r =>
      def bd(c: String): BigDecimal = BigDecimal(r.getAs[String](c))
      val rec = (bd("num") /
        BigDecimal(math.sqrt((bd("den_x") * bd("den_y")).toDouble))).toDouble
      val expect = li.agg(corr(col(raw(r.getAs[String]("col_x"))),
        col(raw(r.getAs[String]("col_y"))))).head.getDouble(0)
      assert(math.abs(rec - expect) < 1e-7,
        s"${r.getAs[String]("col_x")}/${r.getAs[String]("col_y")}: $rec vs $expect")
      // basic certificate sanity: denominators are positive variances
      assert(bd("den_x") > 0 && bd("den_y") > 0)
    }
  }

  // ------------------------------------------------------------ q169
  test("k-anonymity: rows conserved, risk monotone in k") {
    val rows = StatsOps.q169KAnonymity(spark, TestSpark.sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(2L, 5L, 10L, 20L))
    val total = Tables.load(spark, TestSpark.sf, "customer").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === total)
      assert(r.getAs[Long]("rows_at_risk") >= r.getAs[Long]("classes_below"))
    }
    // a class below k is also below every larger k — both risk columns
    // are monotone non-decreasing in k
    val atRisk = rows.map(_.getAs[Long]("rows_at_risk")).toSeq
    assert(atRisk === atRisk.sorted)
    val below = rows.map(_.getAs[Long]("classes_below")).toSeq
    assert(below === below.sorted)
  }

  test("rolling OLS certificates equal a brute trailing-window recompute") {
    val got = StatsOps.q217RollingOls(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3),
        BigInt(r.getString(4)), BigInt(r.getString(5))))).toMap
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("event_type"), expr("ts div 1000").as("tus"),
        graft.streaming.EventsStream.cents(col("value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val minTus = ev.map(_._3).min
    val based = ev.map { case (id, et, tus, v) => (id, et, (tus - minTus) / 1000000L, v) }
    assert(got.size === based.length)
    // brute force the RANGE frame (peers at the same second included)
    based.groupBy(_._2).foreach { case (et, rows) =>
      rows.take(40).foreach { case (id, _, trel, _) =>
        val win = rows.filter(r => r._3 >= trel - 3600 && r._3 <= trel)
        val n = BigInt(win.length)
        val sx = win.map(r => BigInt(r._3)).sum
        val sy = win.map(r => BigInt(r._4)).sum
        val sxy = win.map(r => BigInt(r._3) * BigInt(r._4)).sum
        val sxx = win.map(r => BigInt(r._3) * BigInt(r._3)).sum
        val (gEt, gTrel, gN, gNum, gDen) = got(id)
        assert((gEt, gTrel) === ((et, trel)))
        assert(gN === win.length.toLong, s"event $id")
        assert(gNum === n * sxy - sx * sy, s"event $id num")
        assert(gDen === n * sxx - sx * sx, s"event $id den")
      }
    }
  }

  test("l-diversity: equals a driver recompute over distinct sensitive bands") {
    val rows = StatsOps.q212LDiversity(spark, TestSpark.sf).collect()
    assert(rows.map(_.getAs[Long]("l")).toSeq === Seq(2L, 3L, 5L))
    // direct recompute: per (segment, nation) class, distinct bal bands
    val classes = Tables.load(spark, TestSpark.sf, "customer")
      .select(col("c_mktsegment").as("s"), col("c_nationkey").cast("int").as("n"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000").as("b"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).toSeq.map { case (_, g) =>
        (g.length.toLong, g.map(_._2).distinct.length.toLong)
      }
    rows.foreach { r =>
      val l = r.getAs[Long]("l")
      assert(r.getAs[Long]("n_classes") === classes.length.toLong)
      assert(r.getAs[Long]("classes_below") === classes.count(_._2 < l).toLong)
      assert(r.getAs[Long]("rows_at_risk") ===
        classes.filter(_._2 < l).map(_._1).sum)
      assert(r.getAs[Long]("n_rows") === classes.map(_._1).sum)
    }
    // risk monotone in l
    val atRisk = rows.map(_.getAs[Long]("rows_at_risk")).toSeq
    assert(atRisk === atRisk.sorted)
  }

  // ------------------------------------------------------------ q170
  test("benford: digits partition the orders, expected shares sum to 10^4") {
    val rows = StatsOps.q170BenfordAudit(spark, TestSpark.sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq === (1L to 9L))
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.load(spark, TestSpark.sf, "orders").count())
    assert(rows.map(_.getAs[Long]("exp_bp")).sum === 10000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_bp") ===
        math.abs(r.getAs[Long]("obs_bp") - r.getAs[Long]("exp_bp")))
    }
  }

  // ------------------------------------------------------------ q171
  test("group OLS: certificate reconstructs covar_pop/var_pop slope") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem").select(
      col("l_returnflag").as("grp"),
      col("l_quantity").cast("double").as("x"),
      (round(col("l_extendedprice").cast("double"), 2) * 100).as("y"))
    val expect = li.groupBy("grp").agg(
      (covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("slope"),
      avg("y").as("my"), avg("x").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1),
        r.getDouble(2) - r.getDouble(1) * r.getDouble(3))).toMap
    StatsOps.q171GroupOls(spark, TestSpark.sf).collect().foreach { r =>
      def bd(c: String): BigDecimal = BigDecimal(r.getAs[String](c))
      val (slope, icept) = expect(r.getAs[String]("grp"))
      assert(math.abs((bd("slope_num") / bd("den")).toDouble - slope) < 1e-6)
      assert(math.abs((bd("icept_num") / bd("den")).toDouble - icept) < 1e-4)
    }
  }

  // ------------------------------------------------------------ q172
  test("rank test: U certificate equals brute-force tie-averaged ranks") {
    val r = StatsOps.q172RankTest(spark, TestSpark.sf).head
    val vals = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), (round(col("value"), 2) * 100).cast("long").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val sorted = vals.map(_._2).sorted
    // 2x the average rank of value v among the pooled sample
    def twoRank(v: Long): Long =
      2 * sorted.count(_ < v) + sorted.count(_ == v) + 1
    val n1 = vals.count(_._1 == "click").toLong
    val n2 = vals.count(_._1 == "view").toLong
    val r1x2 = vals.filter(_._1 == "click").map(x => twoRank(x._2)).sum
    assert(r.getAs[Long]("n1") === n1 && r.getAs[Long]("n2") === n2)
    assert(BigDecimal(r.getAs[String]("r1x2")) === BigDecimal(r1x2))
    assert(BigDecimal(r.getAs[String]("u1x2")) ===
      BigDecimal(r1x2 - n1 * (n1 + 1)))
    assert(BigDecimal(r.getAs[String]("u2x2")) ===
      BigDecimal(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1))))
  }

  // ------------------------------------------------------------ q177 km
  test("KM hazard table matches a driver-side survival recompute") {
    val got = StatsOps.q177KmHazard(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
      .as[(Long, String, Long)].collect()
    val t0 = ev.filter(_._2 == "click").groupMapReduce(_._1)(_._3)(math.min)
    val durs = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      t0.get(uid).map { start =>
        val tl = rows.map(_._3).max
        val tp = rows.filter(r => r._2 == "purchase" && r._3 >= start)
          .map(_._3).minOption
        tp match {
          case Some(p) => ((p - start) / 3600000000L, 1L)
          case None => ((tl - start) / 3600000000L, 0L)
        }
      }
    }
    val grid = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }
    var atRisk = durs.size.toLong
    val exp = grid.map { case (t, d, c) =>
      val row = t -> (atRisk, d, c, 10000L * d / atRisk)
      atRisk -= d + c
      row
    }
    assert(got.toSeq === exp)
    // every subject leaves the risk set exactly once
    assert(got.map(r => r._2._2 + r._2._3).sum === t0.size.toLong)
  }

  // ------------------------------------------------------------ q178 acf
  test("ACF certificates match a BigInt recompute over the zero-filled grid") {
    val got = StatsOps.q178AcfCertificate(spark, sf).collect().map { r =>
      (r.getString(0), r.getInt(1)) ->
        (r.getLong(2) +: Seq("sx", "sy", "sxx", "syy", "sxy", "num", "den_x",
          "den_y").map(c => BigInt(r.getAs[String](c))))
    }.toMap
    val daily = Tables.load(spark, sf, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("dc"))
      .as[(String, Long, Long)].collect()
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val byDay = rows.map(r => r._2 -> r._3).toMap
      val series = (rows.map(_._2).min to rows.map(_._2).max)
        .map(d => BigInt(byDay.getOrElse(d, 0L)))
      (1 to 7).foreach { k =>
        val pairs = series.drop(k).zip(series.dropRight(k)).map(_.swap)
        val n = BigInt(pairs.size)
        val sx = pairs.map(_._1).sum
        val sy = pairs.map(_._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val exp = Seq(sx, sy, sxx, syy, sxy,
          n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
        val g = got((tpe, k))
        assert(g.head === pairs.size.toLong, s"$tpe lag $k n")
        assert(g.tail === exp, s"$tpe lag $k")
      }
    }
    // the grid is non-degenerate: every series has variance (den_x > 0)
    assert(got.values.forall(v =>
      v(7).asInstanceOf[BigInt].signum > 0))
  }

  // ------------------------------------------------------------ q185
  test("Spearman certificates match a BigInt recompute on doubled avg ranks") {
    val got = StatsOps.q185SpearmanCertificates(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2) +: Seq("sx", "sy", "sxx", "syy", "sxy", "num",
          "den_x", "den_y")
          .map(c => BigInt(r.getAs[String](c))))
    }.toMap
    val rows = Tables.load(spark, sf, "lineitem")
      .select(StatsOps.corrCols.map { case (n, c) =>
        expr(s"CAST(CAST($c AS DECIMAL(18,4)) * 10000 AS BIGINT)").as(n) }: _*)
      .collect().map(r => StatsOps.corrCols.indices.map(r.getLong).toVector)
    // doubled tie-averaged rank per column: r2(v) = 2|{x<v}| + |{x=v}| + 1
    val rankMaps = StatsOps.corrCols.indices.map { i =>
      val vals = rows.map(_(i))
      val cnts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sortedVals = cnts.keys.toSeq.sorted
      var before = 0L
      sortedVals.map { v =>
        val r2 = 2L * before + cnts(v) + 1L
        before += cnts(v)
        v -> BigInt(r2)
      }.toMap
    }
    val n = BigInt(rows.length)
    StatsOps.corrPairs.foreach { case (a, b) =>
      val ia = StatsOps.corrCols.indexWhere(_._1 == a)
      val ib = StatsOps.corrCols.indexWhere(_._1 == b)
      val ra = rows.map(r => rankMaps(ia)(r(ia)))
      val rb = rows.map(r => rankMaps(ib)(r(ib)))
      val sx = ra.sum; val sy = rb.sum
      val sxx = ra.map(x => x * x).sum
      val syy = rb.map(x => x * x).sum
      val sxy = ra.zip(rb).map { case (x, y) => x * y }.sum
      val exp = Seq(sx, sy, sxx, syy, sxy,
        n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      val g = got((a, b))
      assert(g.head === rows.length.toLong, s"pair ($a, $b) n")
      assert(g.tail === exp, s"pair ($a, $b)")
    }
    // ranks are a permutation-with-ties: den_x must be strictly positive
    assert(got.values.forall(_(7).asInstanceOf[BigInt].signum > 0))
  }

  // ------------------------------------------------------------ q184
  test("seasonal profile matches a driver-side zero-filled-grid recompute") {
    val got = StatsOps.q184SeasonalProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3),
          BigInt(r.getAs[String]("dev_scaled")),
          r.getLong(5))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000"),
        expr("((ts div 1000) div 3600000000) % 24"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      val (dMin, dMax) = (rows.map(_._2).min, rows.map(_._2).max)
      val byCell = rows.groupBy(r => (r._2, r._3)).view
        .mapValues(_.map(_._4).sum).toMap
      (0L to 23L).foreach { how =>
        val series = (dMin to dMax).map(d => d -> byCell.getOrElse((d, how), 0L))
        val nDays = BigInt(series.size)
        val total = series.map(x => BigInt(x._2)).sum
        var best = (BigInt(-1), 0L)
        series.foreach { case (day, c) =>
          val dv = (nDays * c - total).abs
          if (dv > best._1) best = (dv, day)
        }
        assert(got((tpe, how)) ===
          ((series.size.toLong, series.map(_._2).sum, best._1, best._2)),
          s"cell ($tpe, $how)")
      }
    }
    // full grid coverage: 24 cells per type
    assert(got.size === ev.map(_._1).distinct.size * 24)
  }

  // ------------------------------------------------------------ q182 ks
  test("KS certificates match a driver-side recompute over every pair") {
    val got = StatsOps.q182KsCertificates(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3),
          BigInt(r.getAs[String]("d_scaled")),
          r.getLong(5))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.keySet === StatsOps.ksPairs.toSet)
    StatsOps.ksPairs.foreach { case (a, b) =>
      val sa = ev.filter(_._1 == a).map(_._2).sorted
      val sb = ev.filter(_._1 == b).map(_._2).sorted
      val (n1, n2) = (BigInt(sa.length), BigInt(sb.length))
      val grid = (sa ++ sb).distinct.sorted
      var best = (BigInt(-1), 0L)
      grid.foreach { v =>
        val c1 = BigInt(sa.count(_ <= v))
        val c2 = BigInt(sb.count(_ <= v))
        val dd = (n2 * c1 - n1 * c2).abs
        if (dd > best._1) best = (dd, v)
      }
      assert(got((a, b)) === ((sa.length.toLong, sb.length.toLong,
        best._1, best._2)), s"pair ($a, $b)")
    }
  }

  test("q190 count-min: never underestimates; grid and estimates match a driver brute force") {
    val out = StatsOps.q190CountMinSketch(spark, sf).collect()
    assert(out.length === 30)
    assert(out.forall(_.getAs[Long]("over_n") >= 0L), "CM must overestimate only")
    // driver brute force from raw tokens: same md5-derived family
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "").as[String].collect()
    def hb(t: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(6).map("%02x".format(_)).mkString, 16)
    }
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    toks.foreach { t =>
      val h = hb(t)
      for (j <- 0 until 4)
        counters((j, ((h * (2 * j + 1) + j) % (1L << 48)) % 512)) += 1L
    }
    val trueN = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = trueN.toSeq.sortBy { case (t, n) => (-n, t) }.take(30)
    val expect = top.map { case (t, n) =>
      val h = hb(t)
      val est = (0 until 4)
        .map(j => counters((j, ((h * (2 * j + 1) + j) % (1L << 48)) % 512))).min
      (t, n, est, est - n)
    }
    val got = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q192 unpivot: 3 rows per group, values equal the wide aggregate") {
    val long = StatsOps.q192Unpivot(spark, sf).collect()
    val wide = Tables.load(spark, sf, "orders").groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("double").as("n_orders"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_price"),
        max(col("o_totalprice")).as("max_price"))
      .collect()
      .map(r => r.getString(0) -> Map(
        "n_orders" -> r.getDouble(1), "sum_price" -> r.getDouble(2),
        "max_price" -> r.getDouble(3))).toMap
    assert(long.length === wide.size * 3)
    long.foreach { r =>
      assert(r.getDouble(2) === wide(r.getString(0))(r.getString(1)))
    }
  }

  // ------------------------------------------------------------ q219
  test("q219 anova: F matches a direct local recompute, partition identity holds") {
    val r = StatsOps.q219AnovaF(spark, sf).collect().head
    val cents = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val groups = cents.groupBy(_._1)
    assert(r.getAs[Long]("k_groups") === groups.size.toLong)
    assert(r.getAs[Long]("n_total") === cents.length.toLong)
    // direct recompute in BigDecimal-free double (same formula)
    val k = groups.size
    val n = cents.length
    val sTot = cents.map(_._2).sum
    val ssTot = cents.map(x => x._2 * x._2).sum
    val ssbPart = groups.toSeq.sortBy(_._1).map { case (_, g) =>
      val s = g.map(_._2).sum.toDouble
      s * s / g.length.toDouble
    }.foldLeft(0.0)(_ + _)
    val ssb = ssbPart - sTot.toDouble * sTot.toDouble / n.toDouble
    val ssw = ssTot.toDouble - ssbPart
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    assert(math.abs(r.getAs[Double]("f_r6") - f) < 1e-5)
    // SSB + SSW == SST (the ANOVA partition identity) up to FP slack
    val sst = ssTot.toDouble - sTot.toDouble * sTot.toDouble / n.toDouble
    assert(math.abs((ssb + ssw) / sst - 1.0) < 1e-9)
    assert(r.getAs[Double]("eta2_r6") >= 0.0 && r.getAs[Double]("eta2_r6") <= 1.0)
  }

  // ------------------------------------------------------------ q221
  test("q221 t-closeness: EMD in [0,1] basis points, matches a local recompute") {
    val rows = StatsOps.q221TCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bp = r.getAs[Long]("emd_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(r.getAs[Boolean]("t15_breach") === (bp > 1500L))
    }
    // local recompute of one class' EMD over the shared band domain
    val base = Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment").as("s"), col("c_nationkey").cast("int").as("n"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000").as("b"))
      .collect().map(x => ((x.getString(0), x.getInt(1)), x.getLong(2)))
    val bands = base.map(_._2).distinct.sorted
    val nTot = base.length.toLong
    val globCum = bands.map(b => b -> base.count(_._2 <= b).toLong).toMap
    val target = rows.head
    val cls = base.filter(x =>
      x._1 == ((target.getString(0), target.getInt(1))))
    val nC = cls.length.toLong
    val emdScaled = bands.map { b =>
      math.abs(nTot * cls.count(_._2 <= b).toLong - nC * globCum(b))
    }.sum
    assert(target.getAs[Long]("n_rows") === nC)
    assert(target.getAs[Long]("emd_scaled") === emdScaled)
    assert(target.getAs[Long]("emd_bp") ===
      emdScaled * 10000L / (nC * nTot * (bands.length - 1).toLong))
  }

  test("q221 single-band corpus reports EMD 0, not an ANSI divide-by-zero") {
    // every balance lands in band 0 (values < 1000.00), so n_bands = 1:
    // the EMD numerator is 0 by construction (both CDFs complete at the
    // only band) and the greatest(n_bands-1, 1) guard must emit 0 instead
    // of throwing on the 0-denominator integral division
    val dir = java.nio.file.Files.createTempDirectory("graft_q221_1band").toString
    Seq(("SEG", 1, 100.50), ("SEG", 1, 150.25), ("OTHER", 2, 200.00),
      ("OTHER", 2, 999.99))
      .toDF("c_mktsegment", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = StatsOps.q221TCloseness(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("emd_scaled") === 0L)
      assert(r.getAs[Long]("emd_bp") === 0L)
      assert(!r.getAs[Boolean]("t15_breach"))
    }
  }

  // ------------------------------------------------------------ q236
  test("q236 quantile normalization: tie-averaged ranks sum to the rank total") {
    val rows = StatsOps.q236QuantileNormalize(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val n = g.map(_._3).sum
      // sum of cnt * avg-rank over the grid = n(n+1)/2 (rank conservation)
      // in doubled units: sum cnt * two_rbar = n(n+1)
      assert(g.map(x => x._3 * x._4).sum === n * (n + 1))
      // u_ppm monotone strictly increasing with the value
      val ord = g.sortBy(_._2).map(_._5)
      assert(ord.zip(ord.tail).forall { case (a, b) => a < b })
      assert(ord.head > 0L && ord.last < 1000000L)
    }
  }

  // ------------------------------------------------------------ q259/q260
  test("q259 discrete quantiles are actual data elements in order") {
    val rows = StatsOps.q259DiscQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = Tables.load(spark, sf, "events")
      .select(col("event_type"), graft.streaming.EventsStream.cents(col("value")).as("c"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      val qs = Seq(0.25, 0.5, 0.75, 0.95).map { p =>
        xs(math.max(math.ceil(p * xs.length).toInt - 1, 0)) // smallest cum >= p
      }
      assert(Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === qs)
    }
  }

  test("q260 boolean aggregates match direct predicates") {
    val rows = StatsOps.q260BoolAggregates(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = Tables.load(spark, sf, "events")
      .select(col("event_type"), graft.streaming.EventsStream.cents(col("value")).as("c"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      assert(r.getBoolean(1) === xs.forall(_ >= 0L))
      assert(r.getBoolean(2) === xs.exists(_ > 20000L))
      assert(r.getBoolean(3) === xs.forall(_ < 100000L))
      assert(r.getBoolean(4) === xs.contains(0L))
      assert(r.getLong(5) === xs.count(_ > 5000L).toLong)
    }
  }

  test("q261 argmax aggregates pick the composite-key extremes") {
    val rows = StatsOps.q261ArgmaxAggregates(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
        graft.streaming.EventsStream.cents(col("value")).as("c"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val g = byType(r.getString(0))
        .map(x => (x.getLong(2) * 10000000L + x.getLong(1), x.getLong(1),
          x.getLong(2)))
      assert(r.getLong(1) === g.maxBy(_._1)._2)
      assert(r.getLong(2) === g.minBy(_._1)._2)
      assert(r.getLong(3) === g.map(_._3).max)
      assert(r.getLong(4) === g.map(_._3).min)
    }
  }
}
