package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Structural/invariant checks per relational operator. Value-level
  * correctness is the DuckDB oracle's job (tools/check_oracle.py); these
  * specs pin semantics that survive refactors. */
class RelationalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q01 pricing summary: one row per (returnflag, linestatus)") {
    val rows = Relational.q01PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("q02 filter keeps only matching rows") {
    val df = Relational.q02FilterProject(spark, sf)
    assert(df.columns.toSeq ===
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"))
    assert(df.filter(col("l_quantity") < 48).count() === 0)
  }

  test("q12/q13/q14: left join counts = semi + anti partition of customers") {
    val customers = Tables.load(spark, sf, "customer").count()
    val semi = Relational.q13JoinSemi(spark, sf).count()
    val anti = Relational.q14JoinAnti(spark, sf).count()
    val withOrders = Relational.q12JoinLeft(spark, sf)
      .filter(col("n_orders") > 0).count()
    // semi uses a price filter so semi <= withOrders; anti is the complement
    assert(semi <= withOrders)
    assert(withOrders + anti === customers)
  }

  test("q15 top-k is sorted desc and bounded") {
    val rows = Relational.q15TopK(spark, sf).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("set ops: union contains intersect participants; except disjoint from subtrahend") {
    val un = Relational.q16SetUnion(spark, sf)
    assert(un.count() === un.distinct().count()) // set semantics
    val ex = Relational.q18SetExcept(spark, sf)
    val machinery = Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("custkey"))
    assert(ex.join(machinery, "custkey").count() === 0)
  }

  test("q19 window rank: at most 5 per user, rank starts at 1") {
    val df = Relational.q19WindowRank(spark, sf)
    val perUser = df.groupBy("user_id").count().agg(max("count")).head.getLong(0)
    assert(perUser <= 5)
    assert(df.agg(min("rnk")).head.getInt(0) === 1)
  }

  test("q21 running sum is per-user monotone (positive values)") {
    val df = Relational.q21WindowRunning(spark, sf)
    val bad = df.groupBy("user_id")
      .agg(max("running_value").as("mx"), sum(lit(0.0)).as("z"))
    assert(bad.count() > 0) // shape sanity
    val firstVsLast = df.filter(col("seq") === 1)
      .select(col("user_id"), col("running_value").as("first_rv"))
      .join(df.groupBy("user_id").agg(max("running_value").as("max_rv")), "user_id")
      .filter(col("first_rv") > col("max_rv"))
    assert(firstVsLast.count() === 0)
  }

  test("q23 hourly buckets align to the hour") {
    val df = Relational.q23EventsHourly(spark, sf)
    val offHour = df.filter(minute(col("hour_start")) =!= 0 || second(col("hour_start")) =!= 0)
    assert(offHour.count() === 0)
  }

  test("q26 band join covers every order exactly once") {
    val total = Relational.q26RangeBandJoin(spark, sf)
      .agg(sum("n_orders")).head.getLong(0)
    assert(total === Tables.load(spark, sf, "orders").count())
  }

  test("q28 sessionize: session count between 1 and event count per user") {
    val df = Relational.q28Sessionize(spark, sf)
    val ev = Tables.load(spark, sf, "events").groupBy("user_id").count()
    val joined = df.groupBy("user_id").agg(
      count(lit(1)).as("n_sessions"), sum("n_events").as("n_ev"))
      .join(ev, "user_id")
      .filter(col("n_ev") =!= col("count") || col("n_sessions") > col("count"))
    assert(joined.count() === 0)
  }

  test("q94 rank features: deciles balanced, pct_rank/cume monotone in [0,1]") {
    val rows = ops.Relational.q94RankFeatures(spark, TestSpark.sf).collect()
    val bySeg = rows.groupBy(_.getString(1))
    bySeg.values.foreach { seg =>
      val deciles = seg.map(_.getAs[Int]("decile"))
      assert(deciles.min === 1 && deciles.max === 10)
      // ntile balance: bucket sizes differ by at most 1
      val sizes = deciles.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
      val ordered = seg.sortBy(r => (r.getDouble(2), r.getLong(0)))
      val pct = ordered.map(_.getAs[Double]("pct_rank"))
      val cume = ordered.map(_.getAs[Double]("cume"))
      assert(pct.head === 0.0 && pct.last === 1.0 && cume.last === 1.0)
      assert(pct.zip(pct.drop(1)).forall { case (a, b) => a <= b })
      assert(cume.zip(cume.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("q96 k-per-group sample: exactly min(k, group size) rows, re-run stable") {
    val s1 = ops.TextOps.q96GroupSample(spark, TestSpark.sf).collect()
    val sizes = s1.groupBy(_.getString(0)).view.mapValues(_.length)
    val langTotals = Tables.load(spark, TestSpark.sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(n === math.min(10L, langTotals(lang)).toInt)
    }
    val s2 = ops.TextOps.q96GroupSample(spark, TestSpark.sf).collect()
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
  }

  test("q189 correlated subqueries decorrelate: SQL ≡ hand-decorrelated twin, no nested loop") {
    val sql = ops.Relational.q189CorrelatedSubquery(spark, TestSpark.sf)
    val twin = ops.Relational.q189DecorrelatedTwin(spark, TestSpark.sf)
    assert(sql.collect().map(_.toSeq).toSeq === twin.collect().map(_.toSeq).toSeq)
    // Catalyst must rewrite the correlated scalars + EXISTS into joins —
    // a nested-loop or cartesian anywhere means decorrelation failed
    val plan = sql.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the EXISTS must surface as a semi join, the scalars as aggregates
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q198 lateral join equals the window-ranked top-2-per-region twin") {
    import org.apache.spark.sql.expressions.Window
    val got = ops.Relational.q198LateralJoin(spark, TestSpark.sf).collect().map(_.toSeq)
    val perNation = Tables.load(spark, TestSpark.sf, "nation")
      .join(Tables.load(spark, TestSpark.sf, "customer"),
        col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy("n_regionkey", "n_name")
      .agg(count(col("c_custkey")).as("n_cust"))
    val w = Window.partitionBy("n_regionkey")
      .orderBy(col("n_cust").desc, col("n_name"))
    val twin = perNation.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .join(Tables.load(spark, TestSpark.sf, "region"),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("r_name"), col("n_name"), col("n_cust"))
      .orderBy(col("r_name"), col("n_cust").desc, col("n_name"))
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq === twin.toSeq)
  }

  test("q201 variant roundtrip: typed path extraction equals direct column math") {
    import org.apache.spark.sql.types.DecimalType
    val got = ops.Relational.q201VariantJson(spark, TestSpark.sf).collect().map(_.toSeq)
    val direct = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_type").as("t"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        (sum("cents") / 100.0).as("sum_value"))
      .orderBy("t").collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq === direct.toSeq)
  }

  test("q203 xml roundtrip is the identity at row level") {
    import org.apache.spark.sql.types.DecimalType
    val parsed = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_orderstatus").as("st"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("o_orderkey").as("key"))
      .withColumn("xml", concat(
        lit("<o><k>"), col("key").cast("string"), lit("</k><p>"),
        col("cents").cast("string"), lit("</p><s>"), col("st"), lit("</s></o>")))
      .withColumn("r", expr("from_xml(xml, 'k BIGINT, p BIGINT, s STRING')"))
    val bad = parsed.filter(col("r.k") =!= col("key") ||
      col("r.p") =!= col("cents") || col("r.s") =!= col("st") ||
      col("r.k").isNull || col("r.p").isNull || col("r.s").isNull)
    assert(bad.count() === 0)
  }

  test("bag set ops: multiplicities equal min(m,n) and max(m-n,0) of side counts") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val ma = li.filter(col("l_quantity") >= 45).groupBy(col("l_orderkey").as("okey"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mb = li.filter(col("l_discount") >= 0.08).groupBy(col("l_orderkey").as("okey"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (
      ma.keysIterator.flatMap { k =>
        val m = math.min(ma(k), mb.getOrElse(k, 0L))
        if (m > 0) Some(("intersect_all", k, m)) else None
      } ++ ma.keysIterator.flatMap { k =>
        val m = ma(k) - mb.getOrElse(k, 0L)
        if (m > 0) Some(("except_all", k, m)) else None
      }).toSet
    val got = ops.Relational.q211SetOpsAll(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // the data exercises both branches non-trivially
    assert(want.exists(_._1 == "intersect_all") && want.exists(_._1 == "except_all"))
  }

  test("grouping flags label rollup levels; masses tie out across levels") {
    val rows = ops.Relational.q218GroupingFlags(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length === 1 && grand.head._1 === "ALL" && grand.head._2 === "ALL")
    val detail = rows.filter(_._3 == 0L)
    val subtotals = rows.filter(_._3 == 1L)
    assert(rows.forall(r => r._3 != 2L)) // rollup never drops only the first key
    // per-rflag subtotal equals the sum of its detail rows; grand ties all
    subtotals.foreach { case (rf, ls, _, n) =>
      assert(ls === "ALL")
      assert(n === detail.filter(_._1 == rf).map(_._4).sum, rf)
    }
    assert(grand.head._4 === detail.map(_._4).sum)
    // no real key collides with the ALL sentinel
    assert(detail.forall(r => r._1 != "ALL" && r._2 != "ALL"))
  }

  test("NOT IN null semantics: the four anti-join variants relate as 3VL dictates") {
    val r = ops.Relational.q213NotInNulls(spark, TestSpark.sf).collect().head
    def g(c: String) = r.getAs[Long](c)
    // NULLs really are planted on both sides
    assert(g("n_a_null") > 0L && g("n_b_null") > 0L)
    // a NULL in the subquery annihilates NOT IN entirely
    assert(g("n_not_in") === 0L)
    // NOT EXISTS keeps two-valued semantics and keeps NULL-keyed outers
    assert(g("n_not_exists") > 0L && g("n_not_exists") > g("n_a_null"))
    // filtering subquery NULLs restores rows minus the NULL-keyed outers
    assert(g("n_not_in_filtered") === g("n_not_exists") - g("n_a_null"))
    // the null-safe anti matches NULL against NULL, same count here
    assert(g("n_null_safe_anti") === g("n_not_exists") - g("n_a_null"))
  }

  test("q194 recursive CTE walk lands on the closed-form per-customer aggregate") {
    val rec = ops.Relational.q194RecursiveCte(spark, TestSpark.sf)
    val twin = ops.Relational.q194ClosedFormTwin(spark, TestSpark.sf)
    assert(rec.collect().map(_.toSeq).toSeq === twin.collect().map(_.toSeq).toSeq)
    // the plan really is the recursive loop operator, not an expansion
    val plan = rec.queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"), plan)
  }

  test("q220 window extras: ntile balance, rank bounds, ignore-nulls recency") {
    val rows = Relational.q220WindowExtras(spark, sf).collect()
    assert(rows.nonEmpty)
    // ntile(4) bucket sizes within a status differ by at most one
    rows.groupBy(_.getString(1)).foreach { case (_, g) =>
      val sizes = g.groupBy(_.getInt(2)).values.map(_.size)
      assert(g.map(_.getInt(2)).forall(q => q >= 1 && q <= 4))
      if (g.size >= 4) assert(sizes.max - sizes.min <= 1)
      // percent_rank spans [0,1], cume_dist lands in (0,1], both monotone
      // in the unique (price, key) order
      val ord = g.sortBy(r => (r.getAs[Double]("pr"), r.getLong(0)))
      assert(ord.head.getAs[Double]("pr") === 0.0)
      assert(math.abs(ord.last.getAs[Double]("cd") - 1.0) < 1e-15)
      assert(ord.map(_.getAs[Double]("cd")).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      })
      // nth_value over the full frame is constant across the partition
      assert(g.map(_.getAs[Long]("cheapest_key")).distinct.length === 1)
      if (g.size >= 2)
        assert(g.map(_.getAs[Long]("second_cheapest_key")).distinct.length === 1)
    }
    // IGNORE NULLS recency: recompute per customer from the raw table
    val raw = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .collect()
      .map(r => (r.getLong(1), (r.get(3), r.getLong(0)), r.getLong(0),
        r.getDouble(2)))
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ord = g.sortBy(x => (x._2._1.toString, x._2._2))
      var lastBig: Option[Long] = None
      ord.map { x =>
        val out = x._3 -> lastBig
        if (x._4 > 250000.0) lastBig = Some(x._3)
        out
      }
    }
    val got = rows.map(r => r.getLong(0) ->
      Option(r.getAs[java.lang.Long]("prev_big_key")).map(_.longValue())).toMap
    expected.foreach { case (k, v) => assert(got(k) === v, s"order $k") }
  }

  test("q226 calendar math agrees with java.time on every row") {
    val rows = Relational.q226CalendarMath(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val od = r.getDate(1).toLocalDate
      val last = od.withDayOfMonth(od.lengthOfMonth)
      assert(r.getDate(2).toLocalDate === last)
      assert(r.getInt(3) === od.lengthOfMonth)
      assert(r.getInt(4) === od.getDayOfWeek.getValue - 1)
      assert(r.getInt(5) ===
        od.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear))
      assert(r.getDate(6).toLocalDate === od.withDayOfMonth(1).plusMonths(1))
      assert(r.getInt(7) === (od.getYear - 1995) * 12 + od.getMonthValue - 1)
      val biz = (1 to od.lengthOfMonth).count { dd =>
        od.withDayOfMonth(dd).getDayOfWeek.getValue <= 5
      }
      assert(r.getInt(8) === biz)
    }
  }

  test("q227 map surface values match the relational recompute") {
    val rows = Relational.q227MapKv(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, sf, "events")
      .filter(pmod(col("user_id"), lit(11)) === 0)
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = raw.groupBy(_._1)
    rows.foreach { r =>
      val g = byUser(r.getLong(0))
      assert(r.getInt(1) === g.length)
      assert(r.getString(2) === g.map(_._2).sorted.mkString(","))
      assert(r.getLong(3) === g.find(_._2 == "click").map(_._3).getOrElse(0L))
      assert(r.getInt(4) === g.count(_._3 >= 3L))
      assert(r.getLong(5) === 2L * g.map(_._3).sum)
    }
  }

  test("q228 array algebra is consistent set algebra per user") {
    val rows = Relational.q228ArrayAlgebra(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def set(i: Int) = r.getString(i).split(",").filter(_.nonEmpty).toSet
      val (a, b, both, oddOnly) = (set(1), set(2), set(3), set(4))
      assert(both === a.intersect(b))
      assert(oddOnly === b.diff(a))
      assert(r.getInt(5) === a.union(b).size)
      val union = a.union(b).toSeq.sorted
      val pos = union.indexOf("click")
      if (pos >= 0) assert(r.getLong(6) === pos + 1L)
      else assert(r.isNullAt(6))
      assert(r.getBoolean(7) === both.nonEmpty)
    }
  }

  test("q230 string toolkit agrees with JVM string ops") {
    val rows = Relational.q230StringToolkit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val name = r.getString(1)
      val words = name.split(" ")
      assert(r.getString(2) === (if (words.length >= 2) words(1) else ""))
      assert(r.getString(3) === name.map(c =>
        if ("aeiou".contains(c)) '_' else c))
      assert(r.getString(4) ===
        "[a-z]+".r.findAllIn(name).mkString("|"))
      assert(r.getInt(5) === name.count("aeiou".contains(_)))
      assert(r.getString(7) === f"${r.getLong(0)}%010d".takeRight(10))
      assert(r.getString(8) === (words(0) + words(0)).reverse)
    }
  }

  test("q231 gaps-islands: streaks partition the active days") {
    val rows = Relational.q231GapsIslands(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet.toSeq.sorted).toMap
    rows.foreach { r =>
      val ds = raw(r.getLong(0))
      // islands by direct scan
      val islands = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if h.nonEmpty && d == h.head + 1 =>
          (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }.map(_.reverse).reverse
      assert(r.getLong(1) === ds.length.toLong)
      assert(r.getLong(2) === islands.length.toLong)
      val best = islands.maxBy(i => (i.length, -i.head))
      assert(r.getLong(3) === best.length.toLong)
      assert(r.getLong(4) === best.head)
    }
  }

  test("q232 typed cogroup equals the relational left-join twin") {
    val got = Relational.q232CogroupRecon(spark, sf).collect().map(_.toSeq)
    val o = Tables.load(spark, sf, "orders")
      .filter(pmod(col("o_orderkey"), lit(23)) === 0)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("oc"))
    val l = Tables.load(spark, sf, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(23)) === 0)
      .select(col("l_orderkey").as("o_orderkey"),
        expr("""CAST(round(CAST(l_extendedprice AS DECIMAL(12,4))
               | * CAST(1.0 - l_discount AS DECIMAL(12,4))
               | * CAST(1.0 + l_tax AS DECIMAL(12,4)), 2) * 100 AS BIGINT)"""
          .stripMargin).as("lc"))
    val twin = o.join(l, Seq("o_orderkey"), "left")
      .groupBy("o_orderkey")
      .agg(first("oc").as("order_total_c"),
        coalesce(sum("lc"), lit(0L)).as("lines_total_c"),
        count(col("lc")).as("n_lines"))
      .select(col("o_orderkey"), col("order_total_c"), col("lines_total_c"),
        (col("order_total_c") - col("lines_total_c")).as("delta_c"),
        col("n_lines"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq === twin.toSeq)
  }

  test("q234 observe: re-invocable, and metrics equal a direct aggregate") {
    val r1 = Relational.q234ObserveMetrics(spark, sf).collect().head
    // a fresh Observation per call — the API is single-use per Dataset
    val r2 = Relational.q234ObserveMetrics(spark, sf).collect().head
    assert(r1.toSeq === r2.toSeq)
    val direct = Tables.load(spark, sf, "events")
      .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .agg(count(lit(1)), sum("c"), min("c"), max("c"),
        sum(when(col("c") < 0L, 1L).otherwise(0L))).collect().head
    assert(r1.toSeq === direct.toSeq)
  }

  test("q235 generator semantics: outer = inner + empty docs, per language") {
    val rows = Relational.q235GeneratorSemantics(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, empty, inner, outer, nulls) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(outer === inner + empty)
      assert(nulls === empty)
      assert(outer >= docs) // every doc yields >= 1 outer row
    }
  }

  test("q239 out-of-orderness audit: p99 depth covers at least 99% of arrivals") {
    val rows = ops.EtlOps.q239OooAudit(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // local replay for one type
    val t0 = rows.head.getString(0)
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === t0)
      .select(col("event_id"), expr("ts div 1000").as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var hwm = Long.MinValue
    val depths = ev.map { case (_, t) =>
      val d = math.max(if (hwm == Long.MinValue) 0L else hwm - t, 0L)
      hwm = math.max(hwm, t); d
    }
    val r = rows.head
    assert(r.getLong(1) === ev.length.toLong)
    assert(r.getLong(2) === depths.count(_ > 0L).toLong)
    assert(r.getLong(4) === depths.max)
    val p99 = r.getLong(5)
    assert(depths.count(_ <= p99) * 100L >= ev.length.toLong * 99L)
    // and it is the SMALLEST such depth on the grid
    val smaller = depths.filter(_ < p99)
    if (p99 > 0L)
      assert(depths.count(_ <= (if (smaller.isEmpty) -1L else smaller.max))
        * 100L < ev.length.toLong * 99L)
  }

  test("q240 SQL sugar: bands partition the events, all three labels occur") {
    val rows = Relational.q240SqlSugar(spark, sf).collect()
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ===
      Seq("high", "low", "mid"))
    assert(rows.map(_.getLong(2)).sum ===
      Tables.load(spark, sf, "events").count())
  }

  test("q242 try_* family: failing forms are NULL, succeeding twins are values") {
    val rows = Relational.q242TryArithmetic(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && r.isNullAt(2))   // ok_div vs zero divisor
      assert(r.isNullAt(3) && !r.isNullAt(4))   // bad cast vs good cast
      assert(r.isNullAt(5))                     // long overflow
      assert(r.getLong(6) === 2 * r.getLong(0)) // ok multiply
    }
  }

  test("q243 bitwise aggregates match a local fold") {
    val rows = Relational.q243BitwiseOps(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linenumber").cast("long"),
        col("l_orderkey")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val g = raw(r.getString(0))
      assert(r.getLong(1) === g.length.toLong)
      assert(r.getLong(2) === g.map(_._2).reduce(_ & _))
      assert(r.getLong(3) === g.map(_._2).reduce(_ | _))
      assert(r.getLong(4) === g.map(_._3).reduce(_ ^ _))
      assert(r.getLong(5) === g.map(x => 1L << (x._2 % 7).toInt).reduce(_ | _))
    }
  }

  test("q252 xpath extraction inverts construction on every row") {
    val rows = Relational.q252XpathExtract(spark, sf).collect()
    assert(rows.nonEmpty)
    val src = Tables.load(spark, sf, "orders")
      .filter(pmod(col("o_orderkey"), lit(50)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (st, cents) = src(r.getLong(0))
      assert(r.getString(1) === st)
      assert(r.getLong(2) === cents)
      assert(r.getBoolean(3) === (st == "F"))
      assert(r.getInt(4) === 3)
    }
  }

  test("q253 ordered aggregates: list is sorted, mode obeys lowest-wins ties") {
    val rows = Relational.q253OrderedAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, sf, "orders")
      .filter(pmod(col("o_orderkey"), lit(500)) === 0)
      .select("o_orderstatus", "o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val g = raw(r.getString(0))
      assert(r.getString(1) ===
        g.sortBy(x => (x._2, x._3)).map(_._2).mkString("|"))
      val counts = g.groupBy(_._2).view.mapValues(_.size)
      val best = counts.toSeq.sortBy(x => (-x._2, x._1)).head._1
      assert(r.getString(2) === best)
      assert(r.getLong(3) === g.length.toLong)
    }
  }

  test("q254 flatMapGroups gaps: positive, count = events - users") {
    val rows = Relational.q254FlatMapGroups(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 0L))
    val ev = Tables.load(spark, sf, "events")
      .filter(pmod(col("user_id"), lit(29)) === 0)
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.length.toLong === ev.count() - nUsers)
  }

  test("q255 filter clause: filtered counts bounded by the group count") {
    val rows = Relational.q255FilterClause(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
    }
    assert(rows.map(_.getLong(1)).sum ===
      Tables.load(spark, sf, "orders").count())
  }

  test("q256 pagination: keyset page equals the OFFSET page on every row") {
    val rows = Relational.q256Pagination(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getBoolean(2)), "keyset and OFFSET pages diverged")
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q257 legacy LATERAL VIEW OUTER equals the q235 generator contract") {
    val legacy = Relational.q257LateralView(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val modern = Relational.q235GeneratorSemantics(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(3), r.getLong(2)))
    assert(legacy.toSeq === modern.toSeq)
  }

  test("q258 integer-division identities hold on the signed grid") {
    val rows = Relational.q258IntDivSemantics(spark, sf).collect()
    assert(rows.length === 45)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (td, rem, pm, fd) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(td === a / b)                   // JVM division truncates
      assert(rem === a % b)                  // dividend-signed remainder
      assert(td * b + rem === a)             // division identity
      assert(pm === ((a % b) + b) % b && pm >= 0L)
      assert(fd === math.floorDiv(a, b))
      if (a < 0 && rem != 0) assert(fd === td - 1) else assert(fd === td)
    }
  }
}
