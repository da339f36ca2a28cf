package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Layout + profiling operators: the z-order audit must actually deliver
  * multi-dimensional locality, and the profiler's metrics must agree with
  * directly-computed per-column answers. */
class LayoutOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("hilbert order-5 curve: exhaustive bijection and unit-step adjacency") {
    import spark.implicits._
    val n = 32
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y").selectExpr("x AS ox", "y AS oy", "x", "y")
    val walked = LayoutOps.hilbertWalk(grid, Seq("ox", "oy"),
      Seq(16, 8, 4, 2, 1))
      .select("ox", "oy", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bijection onto [0, 1024)
    assert(walked.map(_._3).distinct.length === n * n)
    assert(walked.map(_._3).min === 0L && walked.map(_._3).max === (n * n - 1L))
    // THE Hilbert property: consecutive positions are grid neighbors —
    // this is what the z-curve lacks (its quadrant seams jump)
    walked.sortBy(_._3).sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) === 1L,
        s"non-adjacent step at d=${a._3}: ($a) -> ($b)")
    }
  }

  test("hilbert order-10 walk matches a driver-side xy2d reference on part rows") {
    def xy2d(order: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = order / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val base = Tables.load(spark, TestSpark.sf, "part")
      .select(col("p_partkey"),
        (col("p_size") * 20).cast("long").as("x"),
        (floor(col("p_retailprice") * 10).cast("long") - 9000).as("y"))
      .selectExpr("p_partkey", "x AS xin", "y AS yin", "x", "y")
    val walked = LayoutOps.hilbertWalk(base, Seq("p_partkey", "xin", "yin"),
      LayoutOps.hilbertSteps)
      .select("xin", "yin", "d").collect()
    assert(walked.nonEmpty)
    walked.foreach { r =>
      assert(r.getLong(2) === xy2d(1024, r.getLong(0), r.getLong(1)),
        s"mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order bins are tight on BOTH dimensions (the file-skipping claim)") {
    val bins = LayoutOps.q88ZorderLayout(spark, TestSpark.sf).collect()
    assert(bins.length > 1)
    val nRows = bins.map(_.getAs[Long]("n_rows")).sum
    assert(nRows === Tables.load(spark, TestSpark.sf, "part").count())
    // every bin must span well under the full range of each dimension —
    // the property a single-column sort cannot give on its second column
    // (size domain 1..50, price domain 0..999 after normalization)
    bins.foreach { r =>
      assert(r.getAs[Int]("max_size") - r.getAs[Int]("min_size") <= 13)
      assert(r.getAs[Long]("max_price") - r.getAs[Long]("min_price") <= 256)
    }
  }

  test("shard assignment: banded rank equals the single-window rank; deal balances") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.TextOps
    val sizes = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    // the distributed banded rank must equal the plain global window rank
    val got = LayoutOps.withShard(sizes, 16)
      .select("doc_id", "r0").as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().toMap
    val plain = sizes.withColumn("r0",
        row_number().over(Window.orderBy(col("n_tokens").desc, col("doc_id")))
          .cast("long") - 1)
      .select("doc_id", "r0").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === plain)
    // round-robin property: per-shard doc counts differ by at most 1,
    // and everything is conserved
    val shards = LayoutOps.q145ShardBalance(spark, TestSpark.sf).collect()
    assert(shards.length === 16)
    val counts = shards.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1)
    assert(counts.sum === sizes.count())
    val tokTotal = sizes.agg(sum("n_tokens")).head.getLong(0)
    assert(shards.map(_.getAs[Long]("sum_tokens")).sum === tokTotal)
  }

  test("bucket checksums localize a row diff to exactly one bucket") {
    val report = LayoutOps.q97TableChecksum(spark, TestSpark.sf).collect()
    assert(report.length === 64)
    val mismatched = report.filterNot(_.getAs[Boolean]("bucket_match"))
    assert(mismatched.length === 1)
    // the diff is the min-orderkey rows; their bucket is minKey mod 64
    val minKey = Tables.load(spark, TestSpark.sf, "lineitem")
      .agg(min("l_orderkey")).head.getLong(0)
    assert(mismatched.head.getAs[Long]("bucket") === minKey % 64)
    // row counts drop only in that bucket
    report.foreach { r =>
      val delta = r.getAs[Long]("n_rows_a") - r.getAs[Long]("n_rows_b")
      if (r.getAs[Boolean]("bucket_match")) assert(delta === 0L)
      else assert(delta > 0L)
    }
  }

  test("bucket checksum is partition-layout invariant (commutative sum)") {
    // exercise the generic surface with a NON-lineitem rendering: orders
    // keyed by custkey, to prove the operator is table-shape agnostic
    def sums(df: org.apache.spark.sql.DataFrame) =
      LayoutOps.bucketChecksums(df, col("o_custkey"),
        concat_ws("|", col("o_orderkey"), col("o_orderstatus")), buckets = 16)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = Tables.load(spark, TestSpark.sf, "orders")
    val a = sums(base)
    val b = sums(base.repartition(7).sortWithinPartitions("o_orderdate"))
    assert(a === b)
    assert(a.keySet.size === 16)
  }

  test("column profiler equals directly-computed per-column stats") {
    val prof = LayoutOps.q92ColumnProfile(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val orders = Tables.load(spark, TestSpark.sf, "orders")
    val n = orders.count()
    assert(prof.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority", "o_orderdate"))
    prof.values.foreach(r => assert(r.getAs[Long]("n_rows") === n))
    val status = prof("o_orderstatus")
    val direct = orders.agg(
      countDistinct("o_orderstatus"), min("o_orderstatus"), max("o_orderstatus"))
      .head
    assert(status.getAs[Long]("n_distinct") === direct.getLong(0))
    assert(status.getAs[String]("min_val") === direct.getString(1))
    assert(status.getAs[String]("max_val") === direct.getString(2))
    // zero-padded key rendering preserves numeric order
    val keys = prof("o_orderkey")
    val kDirect = orders.agg(min("o_orderkey"), max("o_orderkey")).head
    assert(keys.getAs[String]("min_val").toLong === kDirect.getLong(0))
    assert(keys.getAs[String]("max_val").toLong === kDirect.getLong(1))
  }

  // ------------------------------------------------------------ q168
  test("skew audit: ranks match brute per-key counts and ratios are exact") {
    val got = LayoutOps.q168SkewAudit(spark, TestSpark.sf).collect()
    assert(got.map(_.getAs[String]("key_col")).distinct.length === 3)
    // brute-force the events.user_id audit
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val brute = ev.groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id")).limit(10).collect()
    val gotEv = got.filter(_.getAs[String]("key_col") == "events.user_id")
      .sortBy(_.getAs[Int]("rank"))
    assert(gotEv.length === brute.length.min(10))
    gotEv.zip(brute).foreach { case (g, b) =>
      assert(g.getAs[Long]("key") === b.getAs[Long]("user_id"))
      assert(g.getAs[Long]("cnt") === b.getAs[Long]("count"))
    }
    val nRows = ev.count()
    val nKeys = ev.select("user_id").distinct().count()
    gotEv.foreach { g =>
      assert(g.getAs[Long]("n_rows") === nRows)
      assert(g.getAs[Long]("n_keys") === nKeys)
      assert(g.getAs[Long]("share_bp") === 10000L * g.getAs[Long]("cnt") / nRows)
      assert(g.getAs[Long]("vs_fair_bp") ===
        10000L * g.getAs[Long]("cnt") * nKeys / nRows)
    }
  }

  test("groupedBandedRank == per-group single-window row_number") {
    import org.apache.spark.sql.expressions.Window
    val sizes = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("lang"), col("doc_id"),
        length(col("text")).cast("long").as("sz"))
    val banded = LayoutOps.groupedBandedRank(sizes, Seq("lang"),
      (length(bin(col("sz"))) - 1).cast("int"),
      Seq(col("sz"), col("doc_id")), "rk")
    val plain = sizes.withColumn("rk2", row_number()
      .over(Window.partitionBy("lang").orderBy("sz", "doc_id")).cast("long"))
    val diff = banded.join(plain, Seq("lang", "doc_id"))
      .filter(col("rk") =!= col("rk2"))
    assert(diff.count() === 0)
  }

  test("bandedExclusiveCumSum == single-window exclusive cumsum (ties, negatives)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // adversarial grid: negative keys straddling the div-band seams
    // (truncating div collapses (-999999..999999) into band 0 — monotone,
    // but the widest band), plus counts chosen so every prefix differs
    val grid = Seq(-2500000L, -1000000L, -999999L, -1L, 0L, 1L, 42L,
        999999L, 1000000L, 1000001L, 2000000L, 7654321L)
      .zipWithIndex.map { case (c, i) => (c, (i + 1).toLong * 3 + 1) }
      .toDF("c", "cnt")
    val banded = LayoutOps.bandedExclusiveCumSum(grid,
      expr("c div 1000000"), col("c"), col("cnt"), "cum")
    val plain = grid.withColumn("cum2", coalesce(sum(col("cnt")).over(
      Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val joined = banded.join(plain, Seq("c", "cnt")).collect()
    assert(joined.length === 12)
    joined.foreach(r => assert(r.getAs[Long]("cum") === r.getAs[Long]("cum2"),
      s"banded != window at c=${r.getAs[Long]("c")}"))
    // empty grid: no rows, no crash (the offsets window sees zero bands)
    val empty = LayoutOps.bandedExclusiveCumSum(
      grid.filter(col("c") > Long.MaxValue - 1),
      expr("c div 1000000"), col("c"), col("cnt"), "cum")
    assert(empty.count() === 0)
  }

  test("gini certificate matches brute-force per-language computation") {
    val got = graft.ops.TextOps.q173GiniTokens(spark, TestSpark.sf).collect()
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("lang"),
        size(graft.ops.TextOps.tokens(col("text"))).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.map(_.getAs[String]("lang")).toSet === docs.keySet)
    got.foreach { r =>
      val xs = docs(r.getAs[String]("lang"))
      val n = xs.length.toLong
      val sx = xs.sum
      val ws = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val num = 2 * ws - (n + 1) * sx
      assert(r.getAs[Long]("n") === n)
      assert(BigDecimal(r.getAs[String]("gini_num")) === BigDecimal(num))
      assert(BigDecimal(r.getAs[String]("gini_den")) === BigDecimal(n * sx))
      assert(r.getAs[Long]("gini_bp") === num * 10000 / (n * sx))
      assert(r.getAs[Long]("gini_bp") >= 0 && r.getAs[Long]("gini_bp") < 10000)
    }
  }

  test("q229 layout audit: clustering a column never worsens its per-shard distincts") {
    val rows = ops.LayoutOps.q229LayoutAudit(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size === 4)
    // same table, same shard size => same shard count everywhere
    assert(rows.values.map(_.getLong(1)).toSet.size === 1)
    val (nat, rfm, lsm, il) = (rows("1_natural"), rows("2_returnflag_major"),
      rows("3_linestatus_major"), rows("4_interleaved"))
    def rf(r: org.apache.spark.sql.Row) = r.getLong(2)
    def ls(r: org.apache.spark.sql.Row) = r.getLong(3)
    // sorting by a column clusters it: its avg distinct-per-shard drops
    // to (near) one value per shard, and never exceeds natural order's
    assert(rf(rfm) <= rf(nat) && rf(rfm) <= 2 * 10000)
    assert(ls(lsm) <= ls(nat) && ls(lsm) <= 2 * 10000)
    // the interleave is the compromise: no worse than natural on BOTH
    assert(rf(il) <= rf(nat) && ls(il) <= ls(nat))
    // max distincts bounded by the dictionary sizes
    rows.values.foreach { r =>
      assert(r.getLong(4) >= 1L && r.getLong(4) <= 3L)
      assert(r.getLong(5) >= 1L && r.getLong(5) <= 3L)
    }
  }

  test("keyBand: monotone in the key, bounded, and actually fine-grained") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic spread of non-negative keys across many magnitudes,
    // including the 0/1 bit-length edge and dense runs
    val keys = ((0L to 64L) ++ (0 until 4000).map(i =>
      math.abs(i.toLong * 2654435761L) % 50000000L)).distinct.sorted
    val bands = keys.toDF("k").orderBy("k")
      .select(graft.ops.LayoutOps.keyBand("k"))
      .as[Long].collect()
    // monotone non-decreasing in key order: the bandedRank precondition
    bands.sliding(2).foreach(w => assert(w(0) <= w(1)))
    assert(bands.forall(b => b >= 0 && b < 4096))
    // fine-grained: far more realized bands than bit-lengths alone, so a
    // top bit-length's population cannot ride one sort task
    assert(bands.distinct.length > 200, s"only ${bands.distinct.length} bands")
  }
}
