package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical / advanced aggregation surface: percentiles, moments,
  * correlation, ordered string aggregation, pivot, generator (explode),
  * approximate distinct, and the UDF/UDAF registration machinery.
  *
  * Scale notes: percentile() is an exact sort-based aggregate (fine per
  * group; for global percentiles at 100 TB use approx_percentile), moments/
  * corr are single-pass mergeable aggregates, pivot compiles to conditional
  * counts (one pass, no shuffle beyond the groupBy), and the UDAF merges a
  * constant-size buffer.
  */
object StatsOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // ---------------------------------------------------------------- q45
  /** Exact interpolated percentiles per group (same linear-interpolation
    * definition as DuckDB quantile_cont). */
  def q45Percentiles(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
        round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"))
      .orderBy("o_orderstatus")

  // ---------------------------------------------------------------- q46
  /** Second-moment aggregates: stddev/variance/correlation/covariance.
    * Single-pass mergeable (Welford-style) in both engines; rounded because
    * the merge order differs. */
  def q46Moments(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q47
  /** Ordered distinct string aggregation (deterministic by sorting). */
  def q47CollectSorted(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        concat_ws(",", sort_array(collect_set(col("o_orderpriority")))).as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("o_orderstatus")

  // ---------------------------------------------------------------- q48
  /** Pivot: status columns from rows (compiles to conditional aggregates —
    * one pass; pivot values pinned so the schema is static, as required for
    * a deterministic plan at any scale). */
  def q48Pivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- q192
  /** UNPIVOT / MELT — q48's inverse, through Spark's NATIVE
    * `Dataset.unpivot` (the wide→long reshape every metrics export and
    * profiler needs; q92's profiler builds its long form by hand with a
    * union, this is the built-in single-operator route). Unpivot is a
    * zero-shuffle generator: each input row fans out to one row per value
    * column in place, so the only shuffle here is the upstream 5-group
    * aggregate. Value columns must share one type — all three metrics are
    * exact-in-double (a count, a decimal-summed total cast once, a max),
    * so the long `val` column stays engine-exact. */
  def q192Unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = t(s, d, "orders").groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("double").as("n_orders"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_price"),
        max(col("o_totalprice")).as("max_price"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("n_orders"), col("sum_price"), col("max_price")),
        "metric", "val")
      .orderBy("o_orderpriority", "metric")
  }

  // ---------------------------------------------------------------- q49
  /** Generator / table function shape: explode tokens, global top-20. */
  def q49ExplodeTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  // ---------------------------------------------------------------- q50
  /** Typed UDAF via Aggregator + functions.udaf: constant-size mergeable
    * buffer (count / integer-valued sum / min / max => order-independent,
    * so the oracle stays exact). */
  case class QtyStats(n: Long, sum: Double, mn: Double, mx: Double)
  val qtyStatsAgg: Aggregator[Double, QtyStats, QtyStats] =
    new Aggregator[Double, QtyStats, QtyStats] {
      def zero: QtyStats = QtyStats(0L, 0.0, Double.MaxValue, Double.MinValue)
      def reduce(b: QtyStats, a: Double): QtyStats =
        QtyStats(b.n + 1, b.sum + a, math.min(b.mn, a), math.max(b.mx, a))
      def merge(x: QtyStats, y: QtyStats): QtyStats =
        QtyStats(x.n + y.n, x.sum + y.sum, math.min(x.mn, y.mn), math.max(x.mx, y.mx))
      def finish(r: QtyStats): QtyStats = r
      def bufferEncoder = Encoders.product[QtyStats]
      def outputEncoder = Encoders.product[QtyStats]
    }

  def q50Udaf(s: SparkSession, d: String): DataFrame = {
    val stats = udaf(qtyStatsAgg)
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(stats(col("l_quantity")).as("s"))
      .select(
        col("l_returnflag"),
        col("s.n").as("n_rows"),
        col("s.sum").as("sum_qty"),
        col("s.mn").as("min_qty"),
        col("s.mx").as("max_qty"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- q51
  /** Scalar Scala UDF registration path (the capability; for anything this
    * simple a native expression — here the oracle's split_part — is the
    * performant choice, since UDFs break codegen fusion). */
  def q51Udf(s: SparkSession, d: String): DataFrame = {
    val priorityRank = udf((p: String) => p.split("-")(0).toInt)
    t(s, d, "orders")
      .select(col("o_orderkey"), priorityRank(col("o_orderpriority")).as("priority_rank"))
      .filter(col("priority_rank") <= 2)
      .groupBy("priority_rank")
      .agg(count(lit(1)).as("n"))
      .orderBy("priority_rank")
  }

  // ---------------------------------------------------------------- q52
  /** approx_count_distinct (HLL++): sketch values differ across engines →
    * rows-only driver check; the spec asserts <2% error vs exact. */
  def q52ApproxDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q141
  /** KMV (k-minimum-values) DISTINCT SKETCH — the mergeable cardinality
    * estimator built on an engine-portable hash, where q52's HLL++ is
    * rows-only because no other engine reproduces Spark's sketch bytes.
    * Per language: hash each document's NORMALIZED content with md5 (the
    * hash both engines share, same normalization as q34/q64 — parity
    * proven there), keep the k smallest distinct hash values, and read the
    * estimate off the k-th smallest: with hashes uniform on [0,1), the
    * k-th order statistic sits near k/n, so n_est = (k-1)/u_k
    * (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07's unbiased
    * form). u_k is taken from the hash's first 8 hex digits as a 32-bit
    * integer, and the estimate is ONE integral division on a <2^53 grid —
    * (k-1)*2^32 div u32 — so DuckDB reproduces it bit-for-bit (double
    * division at this magnitude can floor() off-by-one; `div`//`//` is
    * exact in both engines). A group with fewer than k distinct hashes is
    * below sketch capacity: the sketch IS the distinct set and the
    * estimate is exact.
    *
    * Scale: min-k sets merge by union + re-take-k (associative and
    * commutative), so the sketch partial-aggregates map-side like any
    * mergeable accumulator — the window formulation here is the
    * harness-sized spelling; the constant-size-buffer spelling is the
    * same Aggregator shape as q50's UDAF. The exact n_distinct column
    * rides along to EXPOSE the estimator's error against truth in the
    * result itself (est within ~1/sqrt(k) relative error). */
  def q141KmvSketch(s: SparkSession, d: String, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = t(s, d, "documents").select(col("lang"),
      HashFamily.normMd5(col("text")).as("h"))
    // NULL content (NULL text) is never a sketch MEMBER — in Spark the
    // min-k window would rank a NULL hash FIRST (asc nulls-first) while
    // DuckDB ranks it LAST, so at the k boundary the two sketches would
    // hold different members; n_docs still counts every document and
    // countDistinct skips NULLs natively. A lang with no non-null text
    // has no sketch and no report row (stream twin: DocsStream.KmvProcessor)
    val dh = h.filter(col("h").isNotNull).distinct()
    val mink = dh
      .withColumn("rn", row_number().over(Window.partitionBy("lang").orderBy("h")))
      .filter(col("rn") <= k)
    val sk = mink.groupBy("lang")
      .agg(count(lit(1)).as("m"), max(col("h")).as("kth"))
    val stats = h.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("h")).as("n_distinct"))
    stats.join(sk, "lang")
      .withColumn("kth_prefix", substring(col("kth"), 1, 8))
      .withColumn("u32", conv(col("kth_prefix"), 16, 10).cast("long"))
      .withColumn("est_distinct",
        when(col("m") < k, col("n_distinct"))
          .otherwise(expr(s"CAST(${(k - 1) * 4294967296L} AS BIGINT) div greatest(u32, CAST(1 AS BIGINT))")))
      .select("lang", "n_docs", "n_distinct", "kth_prefix", "est_distinct")
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q190
  /** COUNT-MIN SKETCH — the frequency member of the sketch family (q141
    * counts distincts, q166 quantiles, q110/q154 heavy hitters): a
    * depth-4 × width-512 counter grid over the token stream, point
    * queries read min over the 4 rows. The hash family is the q147
    * derived-from-one-md5 discipline — hb = first 12 md5 hex digits of
    * the token (48-bit), row j's bucket = (hb·(2j+1)+j) mod 2^48 mod 512
    * — entirely integer/hex arithmetic both engines reproduce, so the
    * sketch (and therefore its estimates) carries an EXACT oracle, where
    * a native sketch's bytes would be rows-only.
    *
    * Scale: the counter build is ONE map-side-combinable aggregate onto
    * a 2048-key domain (4 rows × 512 buckets) — the shuffle is
    * domain-sized regardless of corpus size, and counters merge by
    * addition (fully mergeable across shards/streams). Point queries
    * join a 30-row key table against the broadcast 2048-row grid. The
    * exact true counts ride along to EXPOSE the overestimate (CM error
    * ≤ 2N/w with prob 1−2^-4) — that audit column is the only
    * vocab-sized aggregate here; at 100 TB you'd drop it and keep the
    * domain-bounded sketch half. */
  def q190CountMinSketch(s: SparkSession, d: String,
      depth: Int = 4, width: Int = 512, topK: Int = 30): DataFrame = {
    val tk = graft.Transients.track(t(s, d, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("tok"), HashFamily.hb48(col("tok")).as("hb"))
      .transform(graft.Transients.cut))
    val counters = tk
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("hb"))
      .select(col("j"),
        HashFamily.bucket(col("hb"), col("j"), width).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
    val top = tk.groupBy("tok", "hb").agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("tok")).limit(topK)
    top
      .select(col("tok"), col("true_n"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"), col("hb"))
      .select(col("tok"), col("true_n"), col("j"),
        HashFamily.bucket(col("hb"), col("j"), width).as("bucket"))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy("tok", "true_n").agg(min(col("cnt")).as("est_n"))
      .select(col("tok"), col("true_n"), col("est_n"),
        (col("est_n") - col("true_n")).as("over_n"))
      .orderBy(col("true_n").desc, col("tok"))
  }

  /** Shared oracle fragment: the count-min counter grid (q190's build,
    * also the q199 stream twin's entire output). */
  private[graft] val duckCmCounters: String =
    """tk AS (
      | SELECT tok, CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS hb
      | FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)),
      |         '[ \t\n\x0B\f\r]+')) AS tok FROM documents)
      | WHERE tok <> ''),
      |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
      |counters AS (
      | SELECT j, ((hb * (2*j + 1) + j) % 281474976710656) % 512 AS bucket,
      |  count(*) AS cnt
      | FROM tk CROSS JOIN js GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q166
  /** MERGEABLE QUANTILE SKETCH — the quantile member of the q141/q147
    * sketch family: a bottom-k-by-content-hash sample per group is a
    * uniform random sample that is DETERMINISTIC and re-shard-stable
    * (hash order, not partition order — the q64 discipline), and min-k
    * sets merge by union + re-take-k, so the sketch partial-aggregates
    * map-side like any mergeable accumulator. Quantile estimates are the
    * sample's order statistics at ⌈p·m⌉ — all integer rank math, so both
    * engines pick the identical row and the whole sketch keeps an exact
    * oracle (the classic reservoir alternative is partition-order-
    * dependent and could never be oracle'd).
    *
    * The EXACT side rides along to expose the estimator's error against
    * truth (the q141/q147 audit discipline) — computed not by a per-group
    * row sort but from the VALUE HISTOGRAM + running count over distinct
    * values: state is bounded by the value domain, not the row count, so
    * even the audit survives scale when the domain is dense-integer
    * (n_chars here). The sketch is for when it isn't.
    *
    * The bottom-k runs through the native TopKPerGroupExec (bounded heap,
    * partial pass) — no per-group full sort anywhere on the sketch path. */
  def q166SketchQuantiles(s: SparkSession, d: String, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, d, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"),
        HashFamily.normMd5Seeded("graft-qsketch-42", col("text")).as("h"))
    // sketch: bottom-k by hash via the native bounded-heap operator
    val sample = graft.plans.TopK.perGroup(docs, Seq("lang"),
      Seq(("h", true), ("doc_id", true)), k = k, rankName = "rk")
    val sv = sample
      .withColumn("rv", row_number().over(
        Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("lang")))
    val est = sv.groupBy("lang").agg(
      max(col("m")).as("m_sample"),
      max(when(col("rv") === expr("(25*m + 99) div 100"), col("n_chars"))).as("est_p25"),
      max(when(col("rv") === expr("(50*m + 99) div 100"), col("n_chars"))).as("est_p50"),
      max(when(col("rv") === expr("(90*m + 99) div 100"), col("n_chars"))).as("est_p90"))
    // exact audit: histogram + running count over DISTINCT values
    val nn = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val cum = docs.groupBy("lang", "n_chars").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("lang").orderBy("n_chars")))
    val exa = cum.join(nn, "lang").groupBy("lang").agg(
      max(col("n_docs")).as("n_docs"),
      min(when(col("cum") >= expr("(25*n_docs + 99) div 100"), col("n_chars"))).as("exa_p25"),
      min(when(col("cum") >= expr("(50*n_docs + 99) div 100"), col("n_chars"))).as("exa_p50"),
      min(when(col("cum") >= expr("(90*n_docs + 99) div 100"), col("n_chars"))).as("exa_p90"))
    exa.join(est, "lang")
      .select(col("lang"), col("n_docs"), col("m_sample"),
        col("est_p25"), col("est_p50"), col("est_p90"),
        col("exa_p25"), col("exa_p50"), col("exa_p90"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q167
  private[graft] val corrCols = Seq("quantity" -> "l_quantity",
    "extendedprice" -> "l_extendedprice", "discount" -> "l_discount",
    "tax" -> "l_tax")
  private[graft] val corrPairs: Seq[(String, String)] =
    for { i <- corrCols.indices; j <- corrCols.indices if i < j }
      yield (corrCols(i)._1, corrCols(j)._1)

  /** PEARSON CORRELATION MATRIX as EXACT sufficient statistics — the
    * multivariate profiling pass (which numeric columns move together?)
    * in one single-pass, fully mergeable aggregate. Values are quantized
    * to a 10⁻⁴ integer grid (exact for these ≤2-decimal columns), so the
    * 15 accumulators (n, Σx per column, Σx² per column, Σxy per pair) are
    * integers summed in DECIMAL(38,0) — order-free, partial-agg-friendly,
    * and IVM-mergeable like q117/q134. Per-row products stay within int64
    * (max |x| ≈ 1.05e9 from price·10⁴ → x² ≈ 1.1e18 < 2⁶³); sums get the
    * 38-digit headroom (6e9 rows × 1.1e18 ≈ 7e27 — fits with 10 digits
    * to spare at 100 TB).
    *
    * The output is the correlation CERTIFICATE, not a float: per pair,
    * num = n·Σxy − ΣxΣy and den_x/den_y = n·Σx² − (Σx)², from which
    * corr = num/√(den_x·den_y). The float itself is deliberately NOT
    * emitted: a DECIMAL(38,0)→double cast drifts ulps across engines
    * (the q134 lesson), while the certificate is engine-exact — the spec
    * checks √-reconstruction against Spark's own corr() to 1e-9. One scan,
    * one 1-row exchange, a 6-row stack — nothing here scales with data
    * beyond the scan. */
  def q167CorrMatrix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val q = t(s, d, "lineitem").select(corrCols.map { case (n, c) =>
      expr(s"CAST(CAST($c AS DECIMAL(18,4)) * 10000 AS BIGINT)").as(n) }: _*)
    val aggs =
      // cast BEFORE multiplying (the q115 rule): the 1e4-grid quantization
      // of a price column bounded only by the double-money cap (~1e13
      // cents) reaches ~1e15, whose square overflows a raw long — the
      // decimal product never does
      corrCols.map { case (n, _) => sum(col(n).cast(dec38)).as(s"s_$n") } ++
        corrCols.map { case (n, _) =>
          sum(col(n).cast(dec38) * col(n)).as(s"ss_$n") } ++
        corrPairs.map { case (a, b) =>
          sum(col(a).cast(dec38) * col(b)).as(s"sp_${a}_$b") }
    val row = q.agg(count(lit(1)).as("n"), aggs: _*)
    val stackExpr = corrPairs.map { case (a, b) =>
      s"'$a', '$b', s_$a, s_$b, ss_$a, ss_$b, sp_${a}_$b"
    }.mkString(", ")
    Tables.portable(row.selectExpr("n",
      s"stack(${corrPairs.size}, $stackExpr) AS (col_x, col_y, sx, sy, sxx, syy, sxy)")
      .select(col("col_x"), col("col_y"), col("n"),
        col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"),
        (col("n").cast(dec38) * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n").cast(dec38) * col("sxx") - col("sx") * col("sx")).as("den_x"),
        (col("n").cast(dec38) * col("syy") - col("sy") * col("sy")).as("den_y"))
      .orderBy("col_x", "col_y"))
  }

  // ---------------------------------------------------------------- q85
  /** Fixed-width HISTOGRAM — equi-width value binning per event type
    * (bin = floor(value / width)), the distribution-sketching aggregate
    * behind dashboards and data-quality monitors. The bin id is integer
    * floor of one IEEE division (engine-deterministic), counts are
    * integers, and the per-bin value mass sums in DECIMAL — so the whole
    * histogram keeps an exact oracle. One shuffle on (type, bin) with full
    * map-side combine; bin cardinality is bounded by the value range, not
    * the row count, so the result stays tiny at any scale. */
  def q85ValueHistogram(s: SparkSession, d: String, width: Double = 10.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    t(s, d, "events")
      .select(col("event_type"), col("value"),
        floor(col("value") / width).cast("long").as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .withColumn("bin_lo", col("bin") * width)
      .select("event_type", "bin", "bin_lo", "n_events", "sum_value")
      .orderBy("event_type", "bin")
  }

  // ------------------------------------------------------------------------
  // ---------------------------------------------------------------- q103
  /** ROBUST outlier detection — median/MAD, the data-quality gate that
    * mean/stddev can't be (one bad batch of garbage values drags the mean
    * toward itself and hides; the median doesn't move): per event type,
    * flag values whose absolute deviation from the group median exceeds
    * 4.4478·MAD (3σ-equivalent under normality, 3·1.4826).
    *
    * Exactness across engines comes from the INTEGER-CENTS domain: values
    * quantize to cents once (the shared streaming-oracle convention), and
    * every median then interpolates between integers or half-integers —
    * dyadic rationals that ARE representable doubles, so Spark's
    * percentile and DuckDB's quantile_cont agree bit for bit regardless
    * of their interpolation formula. The one non-dyadic multiply
    * (4.4478·mad) is a single operation on identical operands.
    *
    * Shape: a grouped median pass, a deviation-median pass, and the flag
    * pass — three scans (each a per-group exact sort-based percentile or
    * a conditional count; groups are event types), with the tiny
    * per-group statistics broadcast back each time; nothing collects. */
  def q103RobustOutliers(s: SparkSession, d: String): DataFrame = {
    val cents = graft.streaming.EventsStream.cents(col("value"))
    val e = t(s, d, "events").select(col("event_type"), cents.as("cents"))
    val med = e.groupBy("event_type")
      .agg(median(col("cents")).as("med_c"), count(lit(1)).as("n"))
    val dev = e.join(broadcast(med), "event_type")
      .select(col("event_type"), col("n"), col("med_c"),
        abs(col("cents") - col("med_c")).as("adev"))
    val mad = dev.groupBy("event_type").agg(median(col("adev")).as("mad_c"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(first(col("n")).as("n"),
        (first(col("med_c")) / 100.0).as("med"),
        (first(col("mad_c")) / 100.0).as("mad"),
        count(when(col("adev") > lit(4.4478) * col("mad_c"), lit(1)))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q104
  /** Chi-square INDEPENDENCE test — is language distribution independent
    * of source? The categorical drift / bias detector for corpus intake:
    * observed (lang, source) counts against the independence expectation
    * rl·cs/N on the FULL grid (structurally-missing cells count as
    * observed 0 — dropping them understates the statistic). Per-cell
    * contributions (o−e)²/e are quantized once to micro-units with FLOOR
    * (floor has no tie case, so — unlike round(double, s), whose HALF_UP
    * vs nearbyint tie handling genuinely differs between engines — the
    * quantization is engine-exact) and summed as LONGS, making the grand
    * total an exact integer sum (double summation order would be
    * engine-dependent); e itself and the quotient chain are deterministic
    * IEEE on identical integer operands. Row/column totals and the grid
    * are tiny aggregates (|langs|·|sources| cells) — everything after the
    * first groupBy is broadcast-size. */
  def q104ChiSquare(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the contingency table (|langs×sources| rows) is cut once for its
    // FOUR consumers (row/column marginals, grand total, grid attach) —
    // uncut, each re-scanned the corpus for the same tiny aggregate
    // (ScanAudit: documents=4)
    val c = graft.Transients.track(
      t(s, d, "documents").groupBy("lang", "source")
        .agg(count(lit(1)).as("o"))
        .transform(graft.Transients.cut))
    val rl = c.groupBy("lang").agg(sum("o").as("rl"))
    val cs = c.groupBy("source").agg(sum("o").as("cs"))
    val nn = c.agg(sum("o").as("nn"))
    val grid = rl.crossJoin(cs).crossJoin(broadcast(nn))
      .join(c, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"),
        coalesce(col("o"), lit(0L)).as("o"),
        // rl·cs widened to DECIMAL(38,0) before the product (the q115
        // discipline; oracle widens to HUGEINT identically): two ~1e10
        // marginals overflow a raw long product — and the exact-integer
        // product cast once to double matches the oracle bit-for-bit in
        // every regime, where double*double could differ an ulp past 2^53
        ((col("rl").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("cs")).cast("double") / col("nn").cast("double")).as("e"))
    val x = grid.select(col("lang"), col("source"), col("o"), col("e"),
      floor((col("o") - col("e")) * (col("o") - col("e")) / col("e") * 1000000L)
        .as("contrib_u"))
    x.select(col("lang"), col("source"), col("o"),
      (floor(col("e") * 1000000L).cast("double") / 1000000L).as("n_exp"),
      (col("contrib_u").cast("double") / 1000000L).as("contrib"),
      (sum(col("contrib_u")).over(Window.partitionBy()).cast("double")
        / 1000000L).as("chi2_total"))
      .orderBy("lang", "source")
  }

  // ---------------------------------------------------------------- q115
  /** Train/eval DISTRIBUTION-DRIFT detection — Jensen-Shannon divergence
    * between the language distributions of the q64 content-hash splits.
    * The check a pipeline runs after any split or resample: a biased split
    * (one language over-represented in eval) silently skews every eval
    * metric, and JS — unlike KL — is finite and symmetric even when a
    * category is missing from one side.
    *
    * Exactness: with a_l/A the train counts and b_l/B the eval counts, the
    * two log arguments reduce to INTEGER ratios —
    * p_l/m_l = 2·a_l·B/(a_l·B + b_l·A) and symmetrically for q_l/m_l — so
    * each ln is taken on a double quotient of exact longs, rounded ONCE to
    * 6 decimals and pinned to DECIMAL(18,6) (the q72-verified JVM-log ==
    * DuckDB-ln property for integer-ratio arguments). The per-language
    * partial sums a_l·L1_l and b_l·L2_l are then integer×decimal — exact —
    * and JS = Σa_l·L1_l/(2A) + Σb_l·L2_l/(2B) finishes with two
    * decimal→double casts and IEEE ops on deterministic operands. A
    * missing side contributes exactly 0 (the p·ln(p/m) limit), not NaN.
    *
    * Scale: one documents scan computes the (lang, split) contingency
    * (map-side partial counts); everything after is |langs|-sized and
    * rides broadcast one-row cross joins — no second scan, no collect. */
  def q115DistributionDrift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val c = t(s, d, "documents")
      .select(col("lang"), TextOps.splitAssign(col("text")).as("split"))
      .groupBy("lang")
      .agg(count(when(col("split") === "train", 1)).as("a"),
        count(when(col("split") === "eval", 1)).as("b"))
    val tot = c.agg(sum("a").as("ta"), sum("b").as("tb"))
    // products widen to DECIMAL before multiplying: a·B with both counts
    // ~1e10 (the 100 TB corpus) overflows a raw long product
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // try_divide inside the log too: a one-sided corpus (ta or tb = 0)
    // makes ab+ba = 0 even on the a>0 branch — DuckDB's 0/0 is NULL and
    // ln(NULL) stays NULL, so NULL is the shared answer
    val lnDec = (num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =>
      round(log(try_divide(num.cast("double"), den.cast("double"))), 6)
        .cast(dec6)
    val withLn = c.crossJoin(broadcast(tot))
      .select(col("lang"), col("a"), col("b"), col("ta"), col("tb"),
        (col("a").cast(dec38) * col("tb")).as("ab"),
        (col("b").cast(dec38) * col("ta")).as("ba"))
      .select(col("lang"), col("a"), col("b"), col("ta"), col("tb"),
        when(col("a") > 0, lnDec(lit(2) * col("ab"), col("ab") + col("ba")))
          .otherwise(lit(BigDecimal(0)).cast(dec6)).as("l1"),
        when(col("b") > 0, lnDec(lit(2) * col("ba"), col("ab") + col("ba")))
          .otherwise(lit(BigDecimal(0)).cast(dec6)).as("l2"))
    // try_divide: a corpus whose every document lands in ONE split has
    // ta or tb = 0 — the drift against an empty reference is undefined
    // (NULL), identically in DuckDB's `/`
    withLn
      .select(col("lang"), col("a").as("n_train"), col("b").as("n_eval"),
        (try_divide((col("a") * col("l1")).cast("double"),
          lit(2.0) * col("ta").cast("double"))
          + try_divide((col("b") * col("l2")).cast("double"),
            lit(2.0) * col("tb").cast("double"))).as("contrib"),
        (try_divide(
          sum(col("a") * col("l1")).over(Window.partitionBy()).cast("double"),
          lit(2.0) * col("ta").cast("double"))
          + try_divide(
            sum(col("b") * col("l2")).over(Window.partitionBy()).cast("double"),
            lit(2.0) * col("tb").cast("double"))).as("js_total"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q116
  /** IQR-fence value clipping (winsorization) — the feature-clipping /
    * outlier-capping step of a training pipeline: per event type, compute
    * Tukey fences Q1 − 1.5·IQR and Q3 + 1.5·IQR and clamp every value into
    * the band, reporting how much mass moved.
    *
    * Exactness comes from an INTEGER GRID: values quantize to cents once,
    * and quartiles of integers interpolate at quarter positions, so
    * 32·Q1 and 32·Q3 are exactly-representable integer doubles (cast to
    * long loss-free in both engines — an integer-valued double casts
    * identically whether the engine truncates or rounds). 32·IQR is then a
    * long multiple of 8, so the fence 32·(Q1 − 1.5·IQR) = 32·Q1 − 3·32·IQR/2
    * stays pure long arithmetic: the clamp compares longs, the winsorized
    * sum is an exact long sum, and the only doubles in the output are
    * final /3200.0 rescales of exact integers.
    *
    * Scale: two passes over events (one per-group exact quantile — sort
    * within group — and one clamp+sum with the tiny fence table broadcast
    * back); groups are event types, so the quantile sort distributes. At a
    * 100 TB single-group extreme you'd swap percentile for
    * approx_percentile and lose the exactness claim, not the plan. */
  def q116IqrClip(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .select(col("event_type"),
        (graft.streaming.EventsStream.cents(col("value")) * 32L).as("v32"))
    val fences = e.groupBy("event_type")
      .agg((percentile(col("v32"), lit(0.25)) * 32).cast("long").as("q1x"),
        (percentile(col("v32"), lit(0.75)) * 32).cast("long").as("q3x"))
      // q1x/q3x are in 1024ths of a cent (32·v32 percentile ⇒ exact ints);
      // `div` keeps the fence in pure long arithmetic (Spark `/` on longs
      // widens to double) — exact because 3·IQR here is a multiple of 256
      .select(col("event_type"), col("q1x"), col("q3x"),
        expr("q1x - (3 * (q3x - q1x)) div 2").as("lox"),
        expr("q3x + (3 * (q3x - q1x)) div 2").as("hix"))
    e.join(broadcast(fences), "event_type")
      .select(col("event_type"), col("q1x"), col("q3x"), col("lox"), col("hix"),
        (col("v32") * 32L).as("vx"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (first(col("q1x")).cast("double") / 102400.0).as("q1"),
        (first(col("q3x")).cast("double") / 102400.0).as("q3"),
        (first(col("lox")).cast("double") / 102400.0).as("fence_lo"),
        (first(col("hix")).cast("double") / 102400.0).as("fence_hi"),
        count(when(col("vx") < col("lox"), 1)).as("n_clip_lo"),
        count(when(col("vx") > col("hix"), 1)).as("n_clip_hi"),
        // decimal accumulator: a long sum overflows around 1e13 rows of
        // 1/1024-cent units; DuckDB's BIGINT sum widens to HUGEINT anyway
        (sum(greatest(col("lox"), least(col("hix"), col("vx")))
          .cast(org.apache.spark.sql.types.DecimalType(28, 0)))
          .cast("double") / 102400.0).as("sum_winsorized"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q121
  /** POISSON-BOOTSTRAP standard error of the mean — uncertainty
    * quantification for corpus/revenue statistics at scales where classic
    * resampling (draw n rows WITH replacement, B times) is impossible: the
    * Poisson approximation gives every row an independent Poisson(1)
    * multiplicity per replica, so all B resamples ride ONE map-side pass —
    * no sampling shuffle, no row duplication, the standard big-data
    * bootstrap.
    *
    * Engine-exactness (no RNG anywhere): replica b's multiplicity for a
    * row is read off the first 8 hex digits of md5(event_id ":" b)
    * compared against the EMBEDDED cumulative-Poisson(1) thresholds
    * (floor(P·2³²) as fixed-width hex strings — the q64/q65 string-compare
    * trick, so the draw is a pure content function both engines evaluate
    * identically; the ladder truncates at k=9, P(X>9|λ=1) < 1.2e-7).
    * Replica sums are exact longs; each replica mean is one IEEE division;
    * means are floored ONCE onto a micro-cent grid, and the variance of
    * the B grid values is an exact decimal sum of long squares — so the
    * final sqrt takes a deterministic argument (IEEE sqrt is correctly
    * rounded, hence engine-identical).
    *
    * Scale: explode ×B then groupBy(b) — the shuffle carries B partial
    * sums per map task (combiner-collapsed), not B× the data; B=32 rows
    * reach the final window. */
  def q121BootstrapSe(s: SparkSession, d: String, reps: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // floor(P(X <= k)·2^32) for k = 0..8, λ = 1, as 8-hex-digit strings
    val hexT = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
      "ff1025f5", "ffd90f3b", "fffa8b71", "ffff540c", "ffffed1f")
    val ev = t(s, d, "events").filter(col("event_type") === "purchase")
      .select(col("event_id"),
        graft.streaming.EventsStream.cents(col("value")).as("c"))
    val rep = ev
      .select(col("event_id"), col("c"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("u", substring(md5(concat(col("event_id").cast("string"),
        lit(":"), col("b").cast("string")).cast("binary")), 1, 8))
      .withColumn("k", hexT.zipWithIndex
        .foldRight(lit(hexT.length): org.apache.spark.sql.Column) {
        case ((t, i), acc) => when(col("u") < lit(t), lit(i)).otherwise(acc)
      })
    val w = Window.partitionBy()
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // integer-grid bootstrap, start to finish (round 11): the old path
    // computed mean_c = sc/n_eff in DOUBLE and floored a micro-cent grid
    // into a LONG — sc→double is not correctly rounded in DuckDB past
    // 2^53 and the micro grid overflows a long within the cents domain.
    // Now: sc widens to DECIMAL(38,0) (oracle: HUGEINT), the mean
    // quantizes by EXACT trunc-division onto the hundredth-cent grid
    // (never through a double), and only the final sub-2^53 quantities
    // (cent-grid mean, deviation sum) ever reach a double cast. A
    // resample that draws nothing (n_eff = 0) reports NULL mean/deviation
    // in both engines (decimal 0-div is NULL via the guard; `//` is NULL).
    rep.groupBy("b")
      .agg(sum(col("k")).as("n_eff"),
        sum(col("k").cast(dec38) * col("c")).as("sc"))
      .withColumn("mbu", when(col("n_eff") > 0,
        Tables.decTruncDiv(col("sc") * 100, col("n_eff").cast(dec38))))
      .withColumn("mbar_u",
        Tables.decTruncDiv(sum(col("mbu")).over(w), lit(reps).cast(dec38)))
      .withColumn("dev", col("mbu") - col("mbar_u"))
      .withColumn("dev2", col("dev") * col("dev"))
      .select(col("b"), col("n_eff"),
        // the MEAN exports at cent resolution (≤ the cents-grid cap,
        // inside double's exact window); the DEVIATION grid keeps its
        // finer hundredth-cents — deviations are bootstrap spread, small
        // by nature (their sub-2^53 export bound is the q134-documented
        // dispersion assumption of the whole moments family)
        (Tables.decTruncDiv(col("mbu"), lit(100).cast(dec38)).cast("double")
          / 100.0).as("mean_value"),
        (sqrt(sum(col("dev2")).over(w).cast("double") / (reps - 1).toDouble)
          / 10000.0).as("se_value"))
      .orderBy("b")
  }

  // ---------------------------------------------------------------- q110
  /** HEAVY HITTERS via a Misra-Gries sketch + exact recount — frequent
    * tokens with share > 1/64 of all token occurrences, computed WITHOUT a
    * full-vocabulary shuffle. The naive plan (groupBy token, HAVING) moves
    * the entire token domain through the exchange; at 100 TB the vocab is
    * billions of keys of which a handful are heavy. This plan never
    * shuffles the domain:
    *
    *  1. map side: each partition runs Misra-Gries with [[mgCapacity]]
    *     counters over its local tokens and emits only its surviving
    *     candidate tokens (≤ capacity per partition). MG's guarantee is a
    *     SUPERSET property: any token with global count > N/(capacity+1)
    *     must survive in at least one partition (if it died everywhere,
    *     its per-partition counts were each ≤ N_p/(capacity+1), and those
    *     sum to ≤ N/(capacity+1)). Capacity 127 vs the reported 1/64
    *     threshold leaves a 2× guarantee margin.
    *  2. the candidate set (tiny) broadcasts back as a semi-join FILTER on
    *     the token stream, so the exact-recount groupBy shuffles only
    *     candidate tokens — map-side-filtered, partial-combined.
    *  3. the exact counts gate on cnt·64 > N (integer compare; N rides a
    *     broadcast one-row cross join, never a driver collect).
    *
    * Step 3 makes the output INDEPENDENT of sketch internals — the sketch
    * only prunes, the counts and the cut are exact — which is why a plain
    * GROUP BY / HAVING DuckDB oracle applies verbatim. */
  val mgCapacity = 127
  val hhShareDenom = 64
  /** Misra-Gries over one partition's tokens: the ≤ `cap` survivors. */
  private[graft] def misraGries(it: Iterator[String], cap: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { tok =>
      counters.get(tok) match {
        case Some(c) => counters.update(tok, c + 1)
        case None if counters.size < cap => counters.update(tok, 1L)
        case None =>
          // decrement-all round: amortized O(1) — each round cancels
          // cap+1 occurrences (the arriving token plus one per counter)
          val dead = counters.collect { case (k, 1L) => k }
          counters.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  def q110HeavyHitters(s: SparkSession, d: String): DataFrame = {
    // cut: the exploded token table feeds THREE consumers (the
    // Misra-Gries candidate pass, the total count, the exact recount) —
    // without it each consumer re-scans and re-tokenizes the corpus
    // (q190's identical shape takes the same cut, the q147 discipline)
    val tok = graft.Transients.track(t(s, d, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .transform(graft.Transients.cut))
    val candidates = tok.select("token").as(Encoders.STRING)
      .mapPartitions(it => misraGries(it, mgCapacity))(Encoders.STRING)
      .toDF("token").distinct()
    val n = tok.agg(count(lit(1)).as("n_tokens"))
    tok.join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * hhShareDenom > col("n_tokens"))
      .select(col("token"), col("cnt"),
        (col("cnt").cast("double") / col("n_tokens").cast("double")).as("share"))
      .orderBy(col("cnt").desc, col("token"))
  }

  // ---------------------------------------------------------------- q129
  /** Categorical-column ENTROPY profiling — the information-content row of
    * a data profile (q92 reports nulls/distincts/ranges; this reports how
    * concentrated each categorical column's distribution is): Shannon
    * entropy in nats per column, next to the count and distinct count. An
    * entropy near 0 flags a near-constant column (a broken extractor, a
    * single-source scrape); entropy near ln(n_distinct) means a near-
    * uniform mix — both are the profile signals a pipeline alarms on.
    *
    * Exactness is the q115 pinned-log discipline: H = ln N − (Σ c·ln c)/N
    * needs only ln of exact INTEGER counts — each ln is taken once,
    * rounded once to 6 decimals and pinned to DECIMAL(18,6); Σ c·ln c is
    * then integer×decimal (exact in any order), and the finish is one
    * decimal→double cast, one IEEE division and one subtraction on
    * deterministic operands. NULL categories count as a category (a
    * null-heavy column IS concentrated).
    *
    * Scale: one scan per profiled table feeding (column, value) partial
    * counts — the shuffle carries at most |domain| rows per column, and
    * the per-column rollup is |columns|-sized. Exact DuckDB oracle. */
  def q129ColumnEntropy(s: SparkSession, d: String): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val docs = t(s, d, "documents")
    val vals = docs.select(lit("documents.lang").as("col_name"), col("lang").as("val"))
      .unionAll(docs.select(lit("documents.source"), col("source")))
      .unionAll(t(s, d, "events")
        .select(lit("events.event_type"), col("event_type")))
    vals.groupBy("col_name", "val").agg(count(lit(1)).as("c"))
      .withColumn("lnc", round(log(col("c").cast("double")), 6).cast(dec6))
      .groupBy("col_name")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("c") * col("lnc")).as("sclnc"))
      .select(col("col_name"), col("n"), col("n_distinct"),
        (round(log(col("n").cast("double")), 6).cast(dec6).cast("double")
          - col("sclnc").cast("double") / col("n").cast("double"))
          .as("entropy_nats"))
      .orderBy("col_name")
  }

  // ---------------------------------------------------------------- q157
  /** A/B EXPERIMENT readout — deterministic CONTENT-HASH arm assignment
    * (first md5 hex digit of the user id: 0-7 → A, 8-f → B; the q64 split
    * discipline, so re-runs and re-shards never migrate a user between
    * arms) and the pooled two-proportion z-test on purchase conversion.
    *
    * Exactness: counts are exact longs; rates, the pooled variance, and
    * z² are ONE FIXED TREE of IEEE double ops over those exact integers —
    * every operand < 2^53, every op correctly rounded, and DuckDB
    * evaluates the identical tree, so both engines land the identical
    * doubles (the q130/q133 "deterministic IEEE on deterministic
    * operands" discipline). An all-integer z² would need N⁵-sized
    * precision — past DECIMAL(38,0) already at ~10⁷ users — so the fixed
    * double tree is the form that scales. The χ²₁ 95% threshold then
    * yields a portable significance flag (identical doubles ⇒ identical
    * compare). Degenerate pools (everyone or no one converts) report a
    * NULL z² instead of a 0/0.
    *
    * Shape: per-user conversion rollup (one shuffle on user_id, map-side
    * combinable), then a single-row aggregate — nothing corpus-sized
    * crosses the wire after the first combine. */
  def q157AbExperiment(s: SparkSession, d: String): DataFrame = {
    val users = t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
          .otherwise("B"))
    users.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("x_b"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        // try_divide: an empty arm (degenerate split) rates NULL — same
        // NULL DuckDB's `/` yields, and the den>0 guards pass NULL through
        try_divide(col("x_a").cast("double"), col("n_a").cast("double"))
          .as("rate_a"),
        try_divide(col("x_b").cast("double"), col("n_b").cast("double"))
          .as("rate_b"),
        try_divide((col("x_a") + col("x_b")).cast("double"),
          (col("n_a") + col("n_b")).cast("double")).as("pooled"))
      .withColumn("den",
        col("pooled") * (lit(1.0) - col("pooled")) *
          (try_divide(lit(1.0), col("n_a").cast("double"))
            + try_divide(lit(1.0), col("n_b").cast("double"))))
      .withColumn("z2",
        when(col("den") > 0.0,
          (col("rate_a") - col("rate_b")) * (col("rate_a") - col("rate_b"))
            / col("den")))
      .withColumn("significant", when(col("den") > 0.0, col("z2") > 3.841458820694124))
      .drop("den")
  }

  // ---------------------------------------------------------------- q169
  /** K-ANONYMITY audit — the privacy/compliance gate a curated dataset
    * passes before release: group rows into EQUIVALENCE CLASSES on the
    * quasi-identifier tuple (segment, nation, $1000 account-balance band)
    * and, for each disclosure threshold k, report how many classes and
    * rows sit below k (those rows are re-identifiable to fewer than k
    * candidates and must be suppressed or generalized). The balance band
    * is one truncating integral division on the cents grid — Spark `div`
    * and DuckDB `//` both truncate toward zero (re-verified incl.
    * negatives), so the class key is engine-exact and the whole audit
    * carries an exact oracle; risk_bp = rows_at_risk·10⁴ div n_rows is
    * integral too.
    *
    * Scale: one groupBy on the QI tuple with full map-side combine; the
    * class-size relation is bounded by the QI DOMAIN (segments × nations
    * × bands), not the row count, so the k-fanout explode and the final
    * per-k rollup are constant-size at any corpus scale. */
  def q169KAnonymity(s: SparkSession, d: String): DataFrame = {
    val cls = t(s, d, "customer")
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("int").as("nation"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000")
          .as("bal_band"))
      .groupBy("segment", "nation", "bal_band")
      .agg(count(lit(1)).as("cls"))
    cls
      .select(col("cls"), explode(expr("array(2L, 5L, 10L, 20L)")).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("cls") < col("k"), 1L).otherwise(0L)).as("classes_below"),
        sum(col("cls")).as("n_rows"),
        sum(when(col("cls") < col("k"), col("cls")).otherwise(0L)).as("rows_at_risk"))
      .select(col("k"), col("n_classes"), col("classes_below"), col("n_rows"),
        col("rows_at_risk"),
        expr("rows_at_risk * 10000 div n_rows").as("risk_bp"))
      .orderBy("k")
  }

  // ---------------------------------------------------------------- q217
  /** ROLLING-WINDOW REGRESSION — the trend detector over irregular event
    * times: for every event, the OLS slope certificate of value-vs-time
    * over the trailing hour of its type (n, Σt, Σv, Σtv, Σt²) — the
    * time-series member of the q167/q171 certificate family. Peers at
    * the same second share one window by RANGE semantics, so ties cost
    * no determinism. Times rebase to seconds from the corpus minimum,
    * values are cents; every sufficient statistic is DECIMAL(38,0)
    * (the q115 rule; oracle: HUGEINT) — trel·v pairs a multi-year second
    * grid with the full cents grid, overflowing a raw long per ROW.
    *
    * Scale shape (round 11): NOT the naive RANGE-framed window — Spark's
    * sliding-frame aggregation has no retraction, so a `RANGE 3600
    * PRECEDING` sum RE-AGGREGATES the whole frame per row: O(rows ×
    * rows-per-hour) per type, quadratic in stream density (measured
    * 2.9× at sf0.1; unboundedly worse at 1e6 events/s). Instead the
    * classic prefix-sum identity: aggregate to the SECOND GRID (one row
    * per (type, second) — map-side combined), take RUNNING cumulative
    * sums over the grid (a growing frame — incrementally maintained,
    * O(1)/row), look up each second's window-start boundary cum with ONE
    * [[AsofJoin.backward]] pass (cum at the greatest grid second ≤
    * t−3601), and window sums fall out as cum(t) − cum(boundary) — exact
    * integer subtraction, bit-identical to the framed window the oracle
    * replays. Events re-attach by (type, second) equi-join. Everything
    * after the first aggregate is GRID-sized. */
  def q217RollingOls(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    // ONE events scan (round-12: the r11 verdict's last perf finding):
    // the rebase minimum used to be a DRIVER-SIDE action at construction
    // time — a whole redundant pass over events before the real job. The
    // narrow 4-column projection is cut once (the Transients rule: narrow
    // multi-consumer frames cut, corpus-scale explodes don't); the min
    // becomes a broadcast-scalar crossJoin over the checkpointed blocks
    // (the q110/q115 totals pattern), so rebasing happens INSIDE the one
    // job and every consumer — min, grid aggregate, re-attach — reads the
    // checkpoint, not the parquet.
    val ev = graft.Transients.track(graft.Transients.cut(t(s, d, "events")
      .select(col("event_id"), col("event_type"), expr("ts div 1000").as("tus"),
        graft.streaming.EventsStream.cents(col("value")).as("v"))))
    // null-safe: an empty events table has no min — rebase to 0 and the
    // empty grid flows through, never an NPE
    val minDf = ev.agg(coalesce(min("tus"), lit(0L)).as("min_tus"))
    val based = ev.crossJoin(broadcast(minDf))
      .withColumn("trel", expr("(tus - min_tus) div 1000000"))
      .drop("min_tus")
    val wc = Window.partitionBy("event_type").orderBy("trel")
      .rowsBetween(Window.unboundedPreceding, 0) // growing: incremental
    // cum feeds the as-of pass TWICE (as probe payload and as the looked-
    // up right side) — cut once (the q147 multi-consumer discipline)
    val cum = graft.Transients.track(based
      .groupBy("event_type", "trel")
      .agg(count(lit(1)).as("cn"), sum(col("v").cast(dec38)).as("sv"))
      .select(col("event_type"), col("trel"),
        sum(col("cn")).over(wc).as("c_n"),
        sum(col("trel").cast(dec38) * col("cn")).over(wc).as("c_sx"),
        sum(col("sv")).over(wc).as("c_sy"),
        sum(col("trel").cast(dec38) * col("sv")).over(wc).as("c_sxy"),
        sum(col("trel").cast(dec38) * col("trel") * col("cn")).over(wc)
          .as("c_sxx"))
      .transform(graft.Transients.cut))
    val z = lit(BigDecimal(0)).cast(dec38)
    // boundary cum: greatest grid second ≤ trel − 3601 (the frame is
    // [trel−3600, trel] inclusive, so everything at or before trel−3601
    // subtracts out); no match ⇒ empty prefix ⇒ zeros
    val windowed = AsofJoin.backward(
      cum.select(col("event_type"),
        (col("trel") - 3601L).as("bt"), col("trel"),
        col("c_n"), col("c_sx"), col("c_sy"), col("c_sxy"), col("c_sxx")),
      cum.select(col("event_type"), col("trel").as("bt"),
        col("c_n").as("p_n"), col("c_sx").as("p_sx"), col("c_sy").as("p_sy"),
        col("c_sxy").as("p_sxy"), col("c_sxx").as("p_sxx")),
      "event_type", "bt", Seq("p_n", "p_sx", "p_sy", "p_sxy", "p_sxx"))
      .select(col("event_type"), col("trel"),
        (col("c_n") - coalesce(col("p_n"), lit(0L))).as("n_win"),
        (col("c_sx") - coalesce(col("p_sx"), z)).as("sx"),
        (col("c_sy") - coalesce(col("p_sy"), z)).as("sy"),
        (col("c_sxy") - coalesce(col("p_sxy"), z)).as("sxy"),
        (col("c_sxx") - coalesce(col("p_sxx"), z)).as("sxx"))
    Tables.portable(based
      .join(windowed, Seq("event_type", "trel"))
      .select(col("event_id"), col("event_type"), col("trel"), col("n_win"),
        (col("n_win").cast(dec38) * col("sxy").cast(dec38)
          - col("sx").cast(dec38) * col("sy").cast(dec38)).as("slope_num"),
        (col("n_win").cast(dec38) * col("sxx").cast(dec38)
          - col("sx").cast(dec38) * col("sx").cast(dec38)).as("slope_den"))
      .orderBy("event_type", "trel", "event_id"))
  }

  // ---------------------------------------------------------------- q212
  /** L-DIVERSITY AUDIT — the release gate k-anonymity (q169) is famously
    * NOT sufficient for: a class can hold k≫1 rows yet expose its members
    * completely when every row shares the same sensitive value (the
    * homogeneity attack). Per quasi-identifier class (segment, nation —
    * one coarser than q169's grid, so classes are bigger and the failure
    * mode is diversity, not size), the audit counts DISTINCT sensitive
    * values (the account-balance band) and reports, for each l in
    * {2, 3, 5}: classes below l, their row mass, and the risk share in
    * basis points — integer `div`, exact.
    *
    * Scale: one (class, sensitive) distinct-aggregate — two map-side-
    * combined shuffles of bare keys — then a |classes|·|l| grid; nothing
    * downstream scales with rows. */
  def q212LDiversity(s: SparkSession, d: String): DataFrame = {
    val cls = t(s, d, "customer")
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("int").as("nation"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000")
          .as("sensitive"))
      .groupBy("segment", "nation")
      .agg(count(lit(1)).as("cls"), countDistinct("sensitive").as("ldiv"))
    cls
      .select(col("cls"), col("ldiv"), explode(expr("array(2L, 3L, 5L)")).as("l"))
      .groupBy("l")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("ldiv") < col("l"), 1L).otherwise(0L)).as("classes_below"),
        sum(col("cls")).as("n_rows"),
        sum(when(col("ldiv") < col("l"), col("cls")).otherwise(0L)).as("rows_at_risk"))
      .select(col("l"), col("n_classes"), col("classes_below"), col("n_rows"),
        col("rows_at_risk"),
        expr("rows_at_risk * 10000 div n_rows").as("risk_bp"))
      .orderBy("l")
  }

  // ---------------------------------------------------------------- q170
  /** BENFORD FIRST-DIGIT audit — the classic fabricated-data / ingest-
    * corruption screen: the first significant digit of a naturally-spread
    * positive amount should follow P(d) = log₁₀(1+1/d). Everything stays
    * on the integer grid: the digit is the first character of the cents
    * BIGINT rendered as a string (leading digit is invariant under the
    * ×100 shift), observed shares are n·10⁴ div total, and the expected
    * shares are the PINNED basis-point constants 3010/1761/…/458 (they
    * sum to exactly 10⁴) written into both engines as the same CASE
    * literal — no runtime log10, so the per-digit deviation is exact.
    *
    * Scale: one map-side digit projection, one 9-group aggregate, one
    * 9-row window for the total — nothing scales past the scan. */
  def q170BenfordAudit(s: SparkSession, d: String): DataFrame = {
    val expCase = """CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
      | WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669
      | WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END AS BIGINT)""".stripMargin
    t(s, d, "orders")
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("cents"))
      .filter(col("cents") > 0L)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("total", expr("sum(n) OVER ()"))
      .select(col("digit"), col("n"),
        expr("n * 10000 div total").as("obs_bp"),
        expr(expCase).as("exp_bp"))
      .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
      .orderBy("digit")
  }

  // ---------------------------------------------------------------- q171
  /** Per-group OLS REGRESSION as an EXACT certificate — the feature-vs-
    * target fit (price explained by quantity, per return flag) delivered
    * the way q167 delivers correlation: single-pass integer sufficient
    * statistics (n, Σx, Σy, Σx², Σxy on the cents/units grid, summed in
    * DECIMAL(38,0)) and the closed-form numerators/denominator
    *   slope = slope_num/den,  intercept = icept_num/den
    * with slope_num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)², icept_num =
    * Σy·Σx² − Σx·Σxy — all integer products, no float until the caller
    * divides. The spec reconstructs the float slope against Spark's own
    * covar_pop/var_pop to 1e-9; the oracle recomputes the certificate in
    * HUGEINT.
    *
    * Scale: one scan, one mergeable 5-accumulator aggregate per group —
    * the q167 headroom argument applies verbatim (products ≤ ~5e8 per
    * row; 6e9-row sums keep 10 spare digits in DECIMAL(38,0)). */
  def q171GroupOls(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    t(s, d, "lineitem")
      .select(col("l_returnflag").as("grp"),
        expr("CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec38)).as("sx"),
        sum(col("y").cast(dec38)).as("sy"),
        sum((col("x") * col("x")).cast(dec38)).as("sxx"),
        sum((col("x") * col("y")).cast(dec38)).as("sxy"))
      .select(col("grp"), col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"),
        (col("n").cast(dec38) * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n").cast(dec38) * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("sy") * col("sxx") - col("sx") * col("sxy")).as("icept_num"))
      .orderBy("grp")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q172
  /** MANN-WHITNEY U rank test — the nonparametric A/B readout (does the
    * value distribution of `click` events stochastically dominate `view`
    * events?) that q157's z-test can't give when normality fails. Ranks
    * live on the DOUBLED integer grid so tie-averaged ranks stay exact:
    * for a distinct cents value with a+b occurrences and `cum` rows below
    * it, every occurrence's 2·rank is 2·cum + (a+b) + 1. Then
    * 2·R₁ = Σ a·(2·rank), U₁·2 = 2R₁ − n₁(n₁+1), U₂·2 = 2n₁n₂ − U₁·2,
    * and the variance tie-correction Σ(t³−t) is integral — a complete
    * exact certificate (the caller divides by 2 / plugs into the normal
    * approximation).
    *
    * Scale: the cumulative sum runs over the DISTINCT-VALUE relation
    * (domain-bounded — cents of a bounded price range — not row-bounded)
    * AND through [[LayoutOps.bandedExclusiveCumSum]] (the q185 value-band
    * discipline: a bands-sized offset window + per-band in-grid windows —
    * no single-partition window over the value grid even when the domain
    * widens). Row-scale work is one map-side-combined groupBy on value. */
  def q172RankTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val perVal = t(s, d, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("c")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"))
    LayoutOps.bandedExclusiveCumSum(perVal, expr("c div 1000000"),
        col("c"), col("a") + col("b"), "cum")
      .withColumn("two_r", lit(2L) * col("cum") + col("a") + col("b") + lit(1L))
      .agg(sum("a").as("n1"), sum("b").as("n2"),
        // widen BEFORE multiplying (the q185/q167 discipline, and what the
        // HUGEINT oracle does): a raw-long a*two_r overflows past ~2e9
        // rows, and (a+b)^3 in long overflows once a single cents value
        // is shared by more than ~2.1M events — ANSI ArithmeticException
        // in a rank test meant for 100 TB event streams
        sum(col("a").cast(dec38) * col("two_r").cast(dec38)).as("r1x2"),
        sum(expr("""CAST(a + b AS DECIMAL(38,0)) * (a + b) * (a + b)
                  | - (a + b)""".stripMargin))
          .cast(dec38).as("tie_term"))
      .select(col("n1"), col("n2"), col("r1x2"),
        (col("r1x2") - col("n1").cast(dec38) * (col("n1") + lit(1L)).cast(dec38))
          .as("u1x2"),
        (lit(2L).cast(dec38) * col("n1").cast(dec38) * col("n2").cast(dec38)
          - (col("r1x2")
            - col("n1").cast(dec38) * (col("n1") + lit(1L)).cast(dec38)))
          .as("u2x2"),
        col("tie_term"))
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q177
  /** KAPLAN-MEIER hazard table — survival analysis over the event stream:
    * time from each user's FIRST CLICK to their first subsequent PURCHASE,
    * right-censored at the user's last observed event when no purchase
    * ever lands. Per whole-hour duration t: n_risk (subjects whose
    * observed time ≥ t), n_event (conversions at t), n_censored
    * (observation ends at t), and the discrete hazard d/n in basis points.
    * The textbook KM estimator's cumulative product is a float chain no
    * two engines reproduce; the hazard TABLE is its exact sufficient
    * statistic (S(t) = Π(1 − d/n) reconstructs from it), so the operator
    * emits the table — the q167 certificate discipline applied to
    * survival curves. hazard_bp = 10000·d div n is the one division,
    * integral on non-negative operands, identical in both engines.
    *
    * Shape: one user-grained agg pins t0 (first click; map-side combined),
    * one join attaches t0 back (user-keyed shuffle join — |users| rows on
    * the build side), one more user-grained agg closes each subject's
    * (duration, event-flag). Everything after is DURATION-GRID-sized: the
    * n_risk window runs over distinct whole-hour durations (bounded by
    * the observation span — calendar, not data), never over events. */
  def q177KmHazard(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    val t0s = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("tus").as("t0"))
    val subj = ev.join(t0s, "user_id")
      .groupBy("user_id")
      .agg(first(col("t0")).as("t0"), max(col("tus")).as("tl"),
        min(when(col("event_type") === "purchase" && col("tus") >= col("t0"),
          col("tus"))).as("tp"))
      .select(
        when(col("tp").isNotNull, expr("(tp - t0) div 3600000000"))
          .otherwise(expr("(tl - t0) div 3600000000")).as("t_hours"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
    val grid = subj.groupBy("t_hours")
      .agg(sum(col("ev")).as("n_event"),
        sum(lit(1L) - col("ev")).as("n_censored"),
        count(lit(1)).as("n_obs"))
    val w = Window.orderBy("t_hours")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    grid
      .withColumn("n_risk",
        sum(col("n_obs")).over(wAll) -
          (sum(col("n_obs")).over(w) - col("n_obs")))
      .select(col("t_hours"), col("n_risk"), col("n_event"),
        col("n_censored"),
        expr("(10000 * n_event) div n_risk").as("hazard_bp"))
      .orderBy("t_hours")
  }

  // ---------------------------------------------------------------- q178
  private val acfMaxLag = 7

  /** AUTOCORRELATION (ACF) CERTIFICATES — per event type, lag-1..7
    * autocorrelation of the daily-revenue series as EXACT sufficient
    * statistics: the seasonality screen ("does Tuesday predict next
    * Tuesday?") behind forecasting and anomaly baselines. The series is
    * the zero-filled calendar grid per type (missing day = 0 revenue —
    * the gap IS signal; computing lags over present-days-only would
    * silently compare non-adjacent days), built with `sequence()` off
    * each type's [min, max] day span, so the window runs over a
    * calendar-bounded grid, never over raw events.
    *
    * All seven lags ride ONE window pass (7 lag columns), fold into one
    * row per type (n, Σx, Σy, Σx², Σy², Σxy per lag — integers on the
    * cents grid, cast DECIMAL(38,0) BEFORE multiplying so a 100 TB
    * corpus's daily totals can't overflow a long product), and unpivot
    * via stack. Emitted are the q167-style certificates num / den_x /
    * den_y with r = num/√(den_x·den_y) left to the reader — the float is
    * deliberately not computed (engine-exact beats engine-close). */
  def q178AcfCertificate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val cents = graft.streaming.EventsStream.cents _
    val daily = t(s, d, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"),
        cents(col("value")).as("c"))
      .groupBy("event_type", "day")
      .agg(sum(col("c")).as("dc"))
    val grid = daily.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
    val series = grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("dc"), lit(0L)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = series.select(
      col("event_type") +: col("c") +:
        (1 to acfMaxLag).map(k => lag(col("c"), k).over(w).as(s"x$k")): _*)
    val zero = lit(0).cast(dec38)
    val aggs = (1 to acfMaxLag).flatMap { k =>
      val x = col(s"x$k")
      val pair = x.isNotNull
      Seq(
        count(x).as(s"n$k"),
        coalesce(sum(x.cast(dec38)), zero).as(s"sx$k"),
        coalesce(sum(when(pair, col("c")).cast(dec38)), zero).as(s"sy$k"),
        coalesce(sum(x.cast(dec38) * x.cast(dec38)), zero).as(s"sxx$k"),
        coalesce(sum(when(pair, col("c")).cast(dec38)
          * when(pair, col("c")).cast(dec38)), zero).as(s"syy$k"),
        coalesce(sum(x.cast(dec38) * col("c").cast(dec38)), zero).as(s"sxy$k"))
    }
    val row = lagged.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    val stackExpr = (1 to acfMaxLag).map(k =>
      s"$k, n$k, sx$k, sy$k, sxx$k, syy$k, sxy$k").mkString(", ")
    row.selectExpr("event_type",
        s"stack($acfMaxLag, $stackExpr) AS (lag, n, sx, sy, sxx, syy, sxy)")
      .select(col("event_type"), col("lag"), col("n"),
        col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"),
        (col("n").cast(dec38) * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n").cast(dec38) * col("sxx") - col("sx") * col("sx")).as("den_x"),
        (col("n").cast(dec38) * col("syy") - col("sy") * col("sy")).as("den_y"))
      .orderBy("event_type", "lag")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q182
  private[graft] val ksTypes =
    Seq("click", "error", "purchase", "signup", "view")
  private[graft] val ksPairs: Seq[(String, String)] =
    for { i <- ksTypes.indices; j <- ksTypes.indices if i < j }
      yield (ksTypes(i), ksTypes(j))

  /** KOLMOGOROV-SMIRNOV two-sample certificates — the distributional
    * drift test on RAW values (q115's JS divergence needs binning; KS
    * does not): for every pair of event types, the n-SCALED statistic
    *
    *   D' = max_v |n₂·C₁(v) − n₁·C₂(v)|   (≡ n₁·n₂ · sup|F₁ − F₂|)
    *
    * over the merged distinct-cents grid, with the value attaining it
    * (earliest on ties — pinned via max(struct(d, −v))). Like q167/q178,
    * the float D = D'/(n₁n₂) is left to the reader: the certificate is
    * integer-exact at any scale, while the division drifts once n₁·n₂
    * passes 2⁵³.
    *
    * Shape: the scan collapses to (type, cents) counts immediately
    * (map-side combined); the 10 pairs ride ONE generic plan — a 10-row
    * broadcast pair table joined against the count grid, cumulated by a
    * window PARTITIONED on the pair — so cost is grid-sized regardless of
    * row count, and adding pairs never adds passes. */
  def q182KsCertificates(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val cents = graft.streaming.EventsStream.cents _
    val counts = t(s, d, "events")
      .filter(col("event_type").isin(ksTypes: _*))
      .select(col("event_type").as("t"), cents(col("value")).as("cents"))
      .groupBy("t", "cents").agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy("t").agg(sum("cnt").as("n"))
    val pairs = s.createDataFrame(ksPairs).toDF("ta", "tb")
    val merged = counts.join(broadcast(pairs),
        col("t") === col("ta") || col("t") === col("tb"))
      .groupBy("ta", "tb", "cents")
      .agg(sum(when(col("t") === col("ta"), col("cnt")).otherwise(0L)).as("ca"),
        sum(when(col("t") === col("tb"), col("cnt")).otherwise(0L)).as("cb"))
    val w = Window.partitionBy("ta", "tb").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("c1", sum(col("ca")).over(w))
      .withColumn("c2", sum(col("cb")).over(w))
      .join(broadcast(tot.select(col("t").as("ta"), col("n").as("n1"))), "ta")
      .join(broadcast(tot.select(col("t").as("tb"), col("n").as("n2"))), "tb")
      .withColumn("dd",
        abs(col("n2").cast(dec38) * col("c1") - col("n1").cast(dec38) * col("c2")))
      .groupBy("ta", "tb")
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        max(struct(col("dd"), (-col("cents")).as("nc"))).as("m"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n1"), col("n2"), col("m.dd").as("d_scaled"),
        (-col("m.nc")).as("at_cents"))
      .orderBy("type_a", "type_b")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q185
  /** SPEARMAN RANK-CORRELATION certificates — q167's monotone twin: the
    * same six column pairs, correlated on tie-averaged RANKS instead of
    * values, which is the screen that catches monotone-but-nonlinear
    * relationships Pearson flattens. Average ranks under ties are
    * half-integers, so the engine works on DOUBLED ranks
    *
    *   r2(v) = 2·|{x < v}| + |{x = v}| + 1   (≡ 2 · avg-rank, integer)
    *
    * — the ×2 cancels in ρ, and every accumulator stays on the integer
    * grid (DECIMAL(38,0), products cast before multiplying: doubled
    * ranks reach 2n, whose square passes 2⁶³ long before 100 TB).
    *
    * Shape: per column the rank function is VALUE-GRID-sized — distinct
    * quantized values with counts, cumulated by the banded-offset trick
    * (coarse value bands → a bands-sized offset window + per-band
    * in-grid windows; no corpus and no full grid ever crosses one
    * partition — the q145/bandedRank discipline applied to grid
    * cumsums). Rows re-attach their four ranks by hash joins on the
    * quantized value, and the six pairs fold in ONE q167-style pass. */
  def q185SpearmanCertificates(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val base = graft.Transients.track(
      t(s, d, "lineitem").select(corrCols.map { case (n, c) =>
        expr(s"CAST(CAST($c AS DECIMAL(18,4)) * 10000 AS BIGINT)").as(n)
      }: _*).transform(graft.Transients.cut))
    def ranked(name: String): DataFrame = {
      // value-grid cumsum via the shared banded-offset machinery (it
      // checkpoints the grid once for its two window consumers — the
      // q147 multi-consumer discipline)
      val grid = base.groupBy(col(name)).agg(count(lit(1)).as("cnt"))
      LayoutOps.bandedExclusiveCumSum(grid, expr(s"$name div 1000000"),
          col(name), col("cnt"), "cum")
        .select(col(name),
          (lit(2L) * col("cum") + col("cnt") + lit(1L)).as(s"r_$name"))
    }
    val withRanks = corrCols.foldLeft(base) { case (df, (n, _)) =>
      df.join(ranked(n), n)
    }
    val aggs =
      corrCols.map { case (n, _) =>
        sum(col(s"r_$n").cast(dec38)).as(s"s_$n") } ++
        corrCols.map { case (n, _) =>
          sum(col(s"r_$n").cast(dec38) * col(s"r_$n").cast(dec38))
            .as(s"ss_$n") } ++
        corrPairs.map { case (a, b) =>
          sum(col(s"r_$a").cast(dec38) * col(s"r_$b").cast(dec38))
            .as(s"sp_${a}_$b") }
    val row = withRanks.agg(count(lit(1)).as("n"), aggs: _*)
    val stackExpr = corrPairs.map { case (a, b) =>
      s"'$a', '$b', s_$a, s_$b, ss_$a, ss_$b, sp_${a}_$b"
    }.mkString(", ")
    row.selectExpr("n",
        s"stack(${corrPairs.size}, $stackExpr) AS (col_x, col_y, sx, sy, sxx, syy, sxy)")
      .select(col("col_x"), col("col_y"), col("n"),
        col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"),
        (col("n").cast(dec38) * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n").cast(dec38) * col("sxx") - col("sx") * col("sx")).as("den_x"),
        (col("n").cast(dec38) * col("syy") - col("sy") * col("sy")).as("den_y"))
      .orderBy("col_x", "col_y")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q184
  /** SEASONAL PROFILE + OUTLIER-DAY certificates — the hour-of-day
    * seasonality pass (dashboards' "traffic by hour" heatmap) with a
    * per-cell anomaly screen: for every (event type, hour-of-day) cell
    * over the type's zero-filled calendar span, the day whose revenue at
    * that hour deviates most from the cell's own across-days profile.
    * The textbook deviation x − x̄ carries the float mean; the emitted
    * statistic is the D-scaled twin |D·x_d − Σ_d x| (≡ D·|x − x̄|, the
    * q155 discipline per seasonal cell) with the q155 tie-break (equal
    * mass → earlier day, via max(struct(dev, −day))). Integer-cents in
    * DECIMAL(38,0) end to end; no division anywhere.
    *
    * Shape: the scan collapses to (type, day, hour) sums immediately;
    * the zero-filled grid is span-days × 24 per type (calendar-bounded —
    * a day with no traffic at 3am IS the anomaly signal a present-rows
    * grid would miss); one window pass attaches the cell totals, one
    * cell-grained argmax finishes. Nothing after the first aggregate
    * scales with data. */
  def q184SeasonalProfile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val cents = graft.streaming.EventsStream.cents _
    val cells = t(s, d, "events")
      .select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"),
        expr("((ts div 1000) div 3600000000) % 24").as("how"),
        cents(col("value")).as("c"))
      .groupBy("event_type", "day", "how")
      .agg(sum(col("c")).as("dc"))
    val grid = cells.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .select(col("event_type"), col("day"),
        explode(expr("sequence(CAST(0 AS BIGINT), CAST(23 AS BIGINT))"))
          .as("how"))
    val filled = grid.join(cells, Seq("event_type", "day", "how"), "left")
      .select(col("event_type"), col("day"), col("how"),
        coalesce(col("dc"), lit(0L)).as("c"))
    val w = Window.partitionBy("event_type", "how")
    filled
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("total", sum(col("c")).over(w))
      .withColumn("dev",
        abs(col("n_days").cast(dec38) * col("c").cast(dec38)
          - col("total").cast(dec38)))
      .groupBy("event_type", "how")
      .agg(first(col("n_days")).as("n_days"),
        first(col("total")).as("total_cents"),
        max(struct(col("dev"), (-col("day")).as("nd"))).as("m"))
      .select(col("event_type"), col("how"), col("n_days"),
        col("total_cents"), col("m.dev").as("dev_scaled"),
        (-col("m.nd")).as("peak_day"))
      .orderBy("event_type", "how")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q261
  /** ARGMIN/ARGMAX AGGREGATES — min_by / max_by, the one-call form of
    * the max(struct(...)) argmax trick used across this repo (q80, q184,
    * q233…): per type, the event id carrying the extreme value. Both
    * engines leave TIES undefined, so the ordering key is the composite
    * c·2·10¹⁹ + id in DECIMAL(38,0) — strictly unique for EVERY possible
    * long id (2·10¹⁹ exceeds the FULL long span 2⁶⁴ ≈ 1.845·10¹⁹, so even
    * a negative id can never straddle two cents bands; the earlier 10¹⁹
    * multiplier only covered non-negative ids, and the original 10⁷ broke
    * past 10M events — and the decimal grid can't overflow where the long
    * product did: |c|·2·10¹⁹ < 2·10³⁷ < 10³⁸−1) — which makes the pick
    * deterministic and the tie rule (highest cents, then highest id;
    * lowest cents, then lowest id) explicit in the key construction
    * itself, engine and oracle sharing the identical key. */
  def q261ArgmaxAggregates(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .withColumn("key", expr(
        """CAST(c AS DECIMAL(38,0)) * 20000000000000000000
          | + event_id""".stripMargin))
      .groupBy("event_type")
      .agg(
        expr("max_by(event_id, key)").as("max_event_id"),
        expr("min_by(event_id, key)").as("min_event_id"),
        max("c").as("max_c"), min("c").as("min_c"))
      .orderBy("event_type")

  // ---------------------------------------------------------------- q259
  /** DISCRETE PERCENTILES — percentile_disc WITHIN GROUP, the quantile
    * that returns an ACTUAL data element (smallest value whose cumulative
    * share ≥ p — probed identical to DuckDB's quantile_disc selection
    * rule) instead of q45's interpolated blend: on the integer cents
    * grid the result is exact with zero FP anywhere, which makes this
    * the quantile form that survives any engine (the interpolated form
    * needed q45's dyadic-midpoint argument). */
  def q259DiscQuantiles(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_q259_events")
    s.sql("""
      |WITH e AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM graft_q259_events)
      |SELECT event_type,
      |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY c) AS BIGINT)
      |    AS p25_c,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)
      |    AS p50_c,
      |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY c) AS BIGINT)
      |    AS p75_c,
      |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY c) AS BIGINT)
      |    AS p95_c
      |FROM e GROUP BY event_type ORDER BY event_type
      |""".stripMargin)
  }

  // ---------------------------------------------------------------- q260
  /** BOOLEAN AGGREGATES — every / any / bool_and / bool_or / count_if,
    * the predicate-rollup family behind data-quality dashboards
    * ("does EVERY row satisfy the invariant; does ANY row breach the
    * limit; how many"): one pass, short-circuitable, exact. */
  def q260BoolAggregates(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("event_type")
      .agg(
        expr("every(c >= 0)").as("all_nonneg"),
        expr("any(c > 20000)").as("any_over_200"),
        expr("bool_and(c < 100000)").as("all_under_1000"),
        expr("bool_or(c = 0)").as("any_zero"),
        expr("count_if(c > 5000)").as("n_over_50"))
      .orderBy("event_type")

  // ---------------------------------------------------------------- q241
  /** BUILT-IN REGRESSION AGGREGATES — the regr_* family (slope,
    * intercept, r², count, means) q46's moment aggregates leave out:
    * the one-call OLS surface analysts reach for before anything custom.
    * Like q46, these are single-pass mergeable float aggregates whose
    * partial-merge order differs per engine, so results round at 6 dp
    * (the certificate-exact OLS lives in q171/q217 — this query is the
    * API surface, that one is the bit-exact discipline). */
  def q241RegrBuiltins(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").as("n"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 6)
          .as("slope_r6"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6)
          .as("intercept_r6"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2_r6"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)"), 6)
          .as("avgx_r6"),
        round(expr("regr_avgy(l_extendedprice, l_quantity)"), 6)
          .as("avgy_r6"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q236
  /** QUANTILE NORMALIZATION — the rank-based feature transform (map every
    * value to its tie-averaged uniform quantile within its group) that
    * precedes any scale-sensitive model: immune to outliers and monotone
    * re-parameterizations where z-scoring is not. Computed per VALUE-GRID
    * CELL, never per row (the q172/q185 rank discipline): one aggregate
    * to (event_type, cents, cnt), a per-type window over the bounded
    * value domain for the cumulative count, and the tie-averaged doubled
    * rank 2r̄ = 2·cum + cnt + 1 — so the quantile u = r̄/(n+1) lands in
    * integer parts-per-million via one integral division, exact in both
    * engines, and the output is domain-sized (distinct values), not
    * row-sized. A row-level transform is then a broadcast/map-side join
    * of this dictionary back onto the fact — the 100 TB shape. */
  def q236QuantileNormalize(s: SparkSession, d: String): DataFrame =
    quantileTail(t(s, d, "events")
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("event_type", "c")
      .agg(count(lit(1)).as("cnt")))

  /** The tie-averaged rank / ppm-quantile tail over a (event_type, c,
    * cnt) value grid — ONE implementation shared by the batch build
    * (q236) and its stream twin (q245), so the "same tail ⇒ same
    * oracle" equivalence is pinned structurally, not by keeping two
    * copies in sync by hand. */
  private[graft] def quantileTail(grid: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy("event_type")
    grid
      .withColumn("cum", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("n", sum("cnt").over(wn))
      .select(col("event_type"), col("c"), col("cnt"),
        (lit(2L) * col("cum") + col("cnt") + lit(1L)).as("two_rbar"),
        expr("(2 * cum + cnt + 1) * 1000000 div (2 * (n + 1))").as("u_ppm"))
      .orderBy("event_type", "c")
  }

  // ---------------------------------------------------------------- q219
  /** ONE-WAY ANOVA F — does mean event value differ across event types?
    * The k-sample completion of the q157/q172 hypothesis-test family
    * (q157 tests two proportions, q172 two distributions; this tests k
    * means at once). Per-group sufficient statistics (n, Σc, Σc²) are
    * exact integers on the cents grid (longs here; they widen to
    * DECIMAL(38,0) at 100 TB spans — the q115 rule), so the only
    * floating-point work is the final scalar F assembly on ONE row.
    *
    * Cross-engine exactness of that assembly: the between-groups term
    * Σ s_g²/n_g is a sum of per-group doubles, and FP addition order is
    * the one thing engines never agree on — so the k per-group terms are
    * folded in PINNED event_type order (Spark `aggregate` over a sorted
    * struct array ≡ DuckDB list_reduce over `list(... ORDER BY ...)` with
    * a prepended 0.0): both engines execute the identical IEEE op
    * sequence on identical integer inputs, making F bit-deterministic
    * before the 6-dp courtesy rounding.
    *
    * Shape: one map-side-combined aggregate to k rows, one driver-free
    * collect_list over those k rows, scalar math. Nothing after the
    * first aggregate scales with data. */
  def q219AnovaF(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    // s and ss widen to DECIMAL(38,0) BEFORE accumulating (the q115/q167
    // rule): c is bounded only by the DECIMAL(18,2) cents cap ~1e18, so
    // c·c overflows a raw long within the value domain and sum(c) does at
    // row scale; the oracle widens to HUGEINT identically and both export
    // through the VARCHAR certificate (Tables.portable)
    val g = t(s, d, "events")
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec38)).as("s"),
        sum(col("c").cast(dec38) * col("c")).as("ss"))
    val decZero = lit(BigDecimal(0)).cast(dec38)
    // try_divide throughout: ANSI `/` throws DIVIDE_BY_ZERO even on
    // doubles, and the degenerate denominators (empty input, one group,
    // zero within-variance) are exactly where DuckDB's `/` yields NULL —
    // try_divide is the Spark spelling of the same contract
    g.agg(sort_array(collect_list(struct(
        col("event_type"), col("n"), col("s"), col("ss")))).as("gs"))
      .select(
        size(col("gs")).cast("long").as("k_groups"),
        aggregate(col("gs"), lit(0L), (a, x) => a + x.getField("n"))
          .as("n_total"),
        aggregate(col("gs"), decZero, (a, x) =>
          (a + x.getField("s")).cast(dec38)).as("s_total"),
        aggregate(col("gs"), decZero, (a, x) =>
          (a + x.getField("ss")).cast(dec38)).as("ss_total"),
        aggregate(col("gs"), lit(0.0d), (a, x) =>
          a + x.getField("s").cast("double") * x.getField("s").cast("double")
            / x.getField("n").cast("double")).as("ssb_part"))
      .withColumn("gm2", try_divide(
        col("s_total").cast("double") * col("s_total").cast("double"),
        col("n_total").cast("double")))
      .withColumn("ssb", col("ssb_part") - col("gm2"))
      .withColumn("ssw", col("ss_total").cast("double") - col("ssb_part"))
      .select(col("k_groups"), col("n_total"), col("s_total"), col("ss_total"),
        round(col("ssb"), 4).as("ssb_r4"),
        round(col("ssw"), 4).as("ssw_r4"),
        round(try_divide(
          try_divide(col("ssb"), (col("k_groups") - lit(1L)).cast("double")),
          try_divide(col("ssw"),
            (col("n_total") - col("k_groups")).cast("double"))), 6)
          .as("f_r6"),
        round(try_divide(col("ssb"), col("ssb") + col("ssw")), 6)
          .as("eta2_r6"))
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q221
  /** T-CLOSENESS audit — the third leg of the privacy triad (q169
    * k-anonymity: classes big enough; q212 l-diversity: sensitive values
    * varied enough; this: sensitive DISTRIBUTION within each class close
    * enough to the global one that class membership leaks nothing). For
    * the ORDERED sensitive attribute (the q212 balance band), t-closeness
    * distance is the Earth-Mover's Distance — for ordered 1-D histograms
    * exactly the mean absolute difference of the two CDFs.
    *
    * Exactness: both CDFs are rational with known denominators (class
    * size n_c, population N), so every prefix diff scales to the integer
    * |N·cumc_j − n_c·cumg_j| and EMD lands in integer basis points via
    * one integral division — zero floats anywhere (the products are
    * longs here and widen to DECIMAL(38,0) when n_c·N approaches 2⁶³ —
    * the q115 rule). Absent bands must still contribute prefix terms, so
    * classes expand onto the full band grid before the cumsum.
    *
    * Shape: two aggregates (class×band cells, global bands), a
    * broadcast of the BAND-DOMAIN-sized global CDF (11 bands — value-
    * range-bounded, not data-bounded; the one unpartitioned window runs
    * over that same bounded domain), a per-class cumsum window, and a
    * class-grained rollup. Nothing scales past the cell aggregate. */
  def q221TCloseness(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, d, "customer")
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("int").as("nation"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000")
          .as("band"))
    val cells = base.groupBy("segment", "nation", "band")
      .agg(count(lit(1)).as("cnt"))
    val cls = cells.groupBy("segment", "nation").agg(sum("cnt").as("n_c"))
    val glob = base.groupBy("band").agg(count(lit(1)).as("g_cnt"))
    val globCum = glob
      .withColumn("cumg", sum("g_cnt").over(
        Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_total", sum("g_cnt").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("band", "cumg", "n_total")
    val wc = Window.partitionBy("segment", "nation").orderBy("band")
      .rowsBetween(Window.unboundedPreceding, 0)
    cls.crossJoin(broadcast(globCum))
      .join(cells, Seq("segment", "nation", "band"), "left")
      .select(col("segment"), col("nation"), col("band"), col("n_c"),
        col("cumg"), col("n_total"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .withColumn("cumc", sum("cnt").over(wc))
      .withColumn("diffj",
        abs(col("n_total") * col("cumc") - col("n_c") * col("cumg")))
      .groupBy("segment", "nation")
      .agg(first("n_c").as("n_rows"), first("n_total").as("n_total"),
        count(lit(1)).as("n_bands"), sum("diffj").as("emd_scaled"))
      .select(col("segment"), col("nation"), col("n_rows"), col("emd_scaled"),
        // greatest(·,1): a single-band corpus has emd_scaled = 0 by
        // construction (cumc/cumg both complete at the only band), so the
        // guard turns 0 div 0 — an ANSI-mode throw — into the correct 0
        expr("emd_scaled * 10000 div (n_rows * n_total * greatest(n_bands - 1, 1))")
          .as("emd_bp"))
      .withColumn("t15_breach", col("emd_bp") > 1500L)
      .orderBy("segment", "nation")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q185_spearman" -> (q185SpearmanCertificates _),
    "q184_seasonal_profile" -> (q184SeasonalProfile _),
    "q182_ks_test" -> (q182KsCertificates _),
    "q178_acf" -> (q178AcfCertificate _),
    "q177_km_hazard" -> (q177KmHazard _),
    "q169_kanon_audit" -> (q169KAnonymity _),
    "q212_l_diversity" -> (q212LDiversity _),
    "q219_anova" -> (q219AnovaF _),
    "q221_t_closeness" -> (q221TCloseness _),
    "q236_quantile_normalize" -> (q236QuantileNormalize _),
    "q241_regr_builtins" -> (q241RegrBuiltins _),
    "q259_disc_quantiles" -> (q259DiscQuantiles _),
    "q260_bool_aggregates" -> (q260BoolAggregates _),
    "q261_argmax_aggregates" -> (q261ArgmaxAggregates _),
    "q217_rolling_ols" -> (q217RollingOls _),
    "q170_benford_audit" -> (q170BenfordAudit _),
    "q171_group_ols" -> (q171GroupOls _),
    "q172_rank_test" -> (q172RankTest _),
    "q157_ab_experiment" -> (q157AbExperiment _),
    "q141_kmv_distinct" -> ((s: SparkSession, d: String) => q141KmvSketch(s, d)),
    "q190_countmin_freq" -> ((s: SparkSession, d: String) => q190CountMinSketch(s, d)),
    "q166_sketch_quantiles" -> ((s: SparkSession, d: String) => q166SketchQuantiles(s, d)),
    "q167_corr_matrix" -> (q167CorrMatrix _),
    "q129_column_entropy" -> (q129ColumnEntropy _),
    "q121_bootstrap_se" -> ((s: SparkSession, d: String) => q121BootstrapSe(s, d)),
    "q115_distribution_drift" -> (q115DistributionDrift _),
    "q116_iqr_clip" -> (q116IqrClip _),
    "q110_heavy_hitters" -> (q110HeavyHitters _),
    "q103_robust_outliers" -> (q103RobustOutliers _),
    "q104_chi2_independence" -> (q104ChiSquare _),
    "q85_value_histogram" -> ((s: SparkSession, d: String) => q85ValueHistogram(s, d)),
    "q45_percentiles" -> (q45Percentiles _),
    "q46_moments" -> (q46Moments _),
    "q47_collect_sorted" -> (q47CollectSorted _),
    "q48_pivot" -> (q48Pivot _),
    "q192_unpivot" -> (q192Unpivot _),
    "q49_explode_tokens" -> (q49ExplodeTokens _),
    "q50_udaf_stats" -> (q50Udaf _),
    "q51_udf_rank" -> (q51Udf _),
    "q52_approx_distinct" -> (q52ApproxDistinct _))

  val oracle: Map[String, String] = Map(
    // same doubled tie-averaged ranks off per-column value grids (the
    // oracle's single grid window ≡ the engine's banded cumsum), same
    // HUGEINT certificate arithmetic as the q167 twin
    "q185_spearman" -> {
      val gridCtes = corrCols.map { case (n, _) =>
        s"""g_$n AS (
           | SELECT $n, CAST(count(*) AS BIGINT) AS cnt FROM q GROUP BY $n),
           |r_$n AS (
           | SELECT $n, 2 * coalesce(sum(cnt) OVER (ORDER BY $n
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |  + cnt + 1 AS rk FROM g_$n)""".stripMargin
      }.mkString(",\n")
      val joins = corrCols.map { case (n, _) => s"JOIN r_$n USING ($n)" }
        .mkString(" ")
      val rkSel = corrCols.map { case (n, _) => s"r_$n.rk AS rk_$n" }
        .mkString(", ")
      val sqlAggs =
        corrCols.map { case (n, _) =>
          s"CAST(sum(CAST(rk_$n AS HUGEINT)) AS DECIMAL(38,0)) AS s_$n" } ++
          corrCols.map { case (n, _) =>
            s"CAST(sum(CAST(rk_$n AS HUGEINT) * rk_$n) AS DECIMAL(38,0)) AS ss_$n" } ++
          corrPairs.map { case (a, b) =>
            s"CAST(sum(CAST(rk_$a AS HUGEINT) * rk_$b) AS DECIMAL(38,0)) AS sp_${a}_$b" }
      val branches = corrPairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y, n,
           | s_$a AS sx, s_$b AS sy, ss_$a AS sxx, ss_$b AS syy,
           | sp_${a}_$b AS sxy FROM a""".stripMargin
      }.mkString("\n UNION ALL\n")
      s"""WITH q AS (
         | SELECT ${corrCols.map { case (n, c) =>
        s"CAST(CAST($c AS DECIMAL(18,4)) * 10000 AS BIGINT) AS $n" }.mkString(",\n  ")}
         | FROM lineitem),
         |$gridCtes,
         |j AS (SELECT $rkSel FROM q $joins),
         |a AS (SELECT count(*) AS n, ${sqlAggs.mkString(",\n  ")} FROM j),
         |m AS (
         |$branches)
         |SELECT col_x, col_y, n,
         | CAST(sx AS VARCHAR) AS sx, CAST(sy AS VARCHAR) AS sy,
         | CAST(sxx AS VARCHAR) AS sxx, CAST(syy AS VARCHAR) AS syy,
         | CAST(sxy AS VARCHAR) AS sxy,
         | CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
         |   - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR) AS num,
         | CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
         |   - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS VARCHAR) AS den_x,
         | CAST(CAST(n AS HUGEINT) * CAST(syy AS HUGEINT)
         |   - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR) AS den_y
         |FROM m ORDER BY col_x, col_y""".stripMargin
    },
    // same zero-filled (day × hour) calendar grid, D-scaled deviations in
    // HUGEINT, earlier-day tie via struct_pack max
    "q184_seasonal_profile" ->
      """WITH e AS (
        | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |  (epoch_us(ts) // 3600000000) % 24 AS how,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events),
        |cells AS (
        | SELECT event_type, day, how, CAST(sum(c) AS BIGINT) AS dc
        | FROM e GROUP BY 1, 2, 3),
        |span AS (
        | SELECT event_type, min(day) AS d0, max(day) AS d1
        | FROM cells GROUP BY 1),
        |g1 AS (
        | SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM span),
        |grid AS (
        | SELECT event_type, day, unnest(generate_series(0, 23)) AS how FROM g1),
        |filled AS (
        | SELECT g.event_type, g.day, g.how, coalesce(c.dc, 0) AS c
        | FROM grid g LEFT JOIN cells c
        |   ON g.event_type = c.event_type AND g.day = c.day AND g.how = c.how),
        |st AS (
        | SELECT event_type, how, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(c) AS BIGINT) AS total
        | FROM filled GROUP BY 1, 2),
        |dev AS (
        | SELECT f.event_type, f.how, st.n_days, st.total, f.day,
        |  abs(CAST(st.n_days AS HUGEINT) * f.c - st.total) AS dv
        | FROM filled f JOIN st USING (event_type, how)),
        |mx AS (
        | SELECT event_type, how, any_value(n_days) AS n_days,
        |  any_value(total) AS total_cents,
        |  max(struct_pack(dev := CAST(dv AS DECIMAL(38,0)), nd := -day)) AS m
        | FROM dev GROUP BY 1, 2)
        |SELECT event_type, how, n_days, total_cents,
        | CAST(m.dev AS VARCHAR) AS dev_scaled, -(m.nd) AS peak_day
        |FROM mx ORDER BY event_type, how""".stripMargin,
    // same count grid, pair-partitioned cumulatives and HUGEINT n-scaled
    // statistic; struct_pack max ≡ Spark max(struct) pins the tie to the
    // earliest cents value
    "q182_ks_test" -> {
      val vals = ksPairs.map { case (a, b) => s"('$a', '$b')" }.mkString(", ")
      s"""WITH c AS (
         | SELECT event_type AS t,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |  CAST(count(*) AS BIGINT) AS cnt
         | FROM events GROUP BY 1, 2),
         |tot AS (SELECT t, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY t),
         |pairs(ta, tb) AS (VALUES $vals),
         |merged AS (
         | SELECT p.ta, p.tb, c.cents,
         |  CAST(sum(CASE WHEN c.t = p.ta THEN c.cnt ELSE 0 END) AS BIGINT) AS ca,
         |  CAST(sum(CASE WHEN c.t = p.tb THEN c.cnt ELSE 0 END) AS BIGINT) AS cb
         | FROM pairs p JOIN c ON c.t = p.ta OR c.t = p.tb
         | GROUP BY 1, 2, 3),
         |cum AS (
         | SELECT ta, tb, cents,
         |  sum(ca) OVER w AS c1, sum(cb) OVER w AS c2
         | FROM merged
         | WINDOW w AS (PARTITION BY ta, tb ORDER BY cents
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |dd AS (
         | SELECT cum.ta, cum.tb, t1.n AS n1, t2.n AS n2, cum.cents,
         |  abs(CAST(t2.n AS HUGEINT) * c1 - CAST(t1.n AS HUGEINT) * c2) AS d
         | FROM cum JOIN tot t1 ON cum.ta = t1.t JOIN tot t2 ON cum.tb = t2.t),
         |mx AS (
         | SELECT ta, tb, any_value(n1) AS n1, any_value(n2) AS n2,
         |  max(struct_pack(d := CAST(d AS DECIMAL(38,0)), nc := -cents)) AS m
         | FROM dd GROUP BY 1, 2)
         |SELECT ta AS type_a, tb AS type_b, n1, n2,
         | CAST(m.d AS VARCHAR) AS d_scaled, -(m.nc) AS at_cents
         |FROM mx ORDER BY type_a, type_b""".stripMargin
    },
    // same zero-filled calendar grid, lag windows and integer certificate
    // arithmetic (HUGEINT products cast to DECIMAL(38,0), the q167 twin)
    "q178_acf" -> {
      val lagCols = (1 to acfMaxLag)
        .map(k => s"lag(c, $k) OVER w AS x$k").mkString(",\n  ")
      val branches = (1 to acfMaxLag).map { k =>
        s"""SELECT event_type, $k AS lag, count(x$k) AS n,
           | CAST(coalesce(sum(CAST(x$k AS HUGEINT)), 0) AS DECIMAL(38,0)) AS sx,
           | CAST(coalesce(sum(CASE WHEN x$k IS NOT NULL
           |   THEN CAST(c AS HUGEINT) END), 0) AS DECIMAL(38,0)) AS sy,
           | CAST(coalesce(sum(CAST(x$k AS HUGEINT) * x$k), 0)
           |   AS DECIMAL(38,0)) AS sxx,
           | CAST(coalesce(sum(CASE WHEN x$k IS NOT NULL
           |   THEN CAST(c AS HUGEINT) * c END), 0) AS DECIMAL(38,0)) AS syy,
           | CAST(coalesce(sum(CAST(x$k AS HUGEINT) * c), 0)
           |   AS DECIMAL(38,0)) AS sxy
           |FROM lagged GROUP BY event_type""".stripMargin
      }.mkString("\n UNION ALL\n")
      s"""WITH e AS (
         | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM events),
         |daily AS (
         | SELECT event_type, day, CAST(sum(c) AS BIGINT) AS dc
         | FROM e GROUP BY 1, 2),
         |span AS (
         | SELECT event_type, min(day) AS d0, max(day) AS d1
         | FROM daily GROUP BY 1),
         |grid AS (
         | SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM span),
         |series AS (
         | SELECT g.event_type, g.day, coalesce(d.dc, 0) AS c
         | FROM grid g LEFT JOIN daily d
         |   ON g.event_type = d.event_type AND g.day = d.day),
         |lagged AS (
         | SELECT event_type, c,
         |  $lagCols
         | FROM series WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |m AS (
         |$branches)
         |SELECT event_type, lag, n,
         | CAST(sx AS VARCHAR) AS sx, CAST(sy AS VARCHAR) AS sy,
         | CAST(sxx AS VARCHAR) AS sxx, CAST(syy AS VARCHAR) AS syy,
         | CAST(sxy AS VARCHAR) AS sxy,
         | CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
         |   - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR) AS num,
         | CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
         |   - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS VARCHAR) AS den_x,
         | CAST(CAST(n AS HUGEINT) * CAST(syy AS HUGEINT)
         |   - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR) AS den_y
         |FROM m ORDER BY event_type, lag""".stripMargin
    },
    // same subject construction and integer-hour grid; hazard is the one
    // integral division, both engines truncating on non-negative operands
    "q177_km_hazard" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |t0s AS (
        | SELECT user_id, min(tus) AS t0 FROM e
        | WHERE event_type = 'click' GROUP BY user_id),
        |subj AS (
        | SELECT e.user_id, any_value(t0s.t0) AS t0, max(e.tus) AS tl,
        |  min(CASE WHEN e.event_type = 'purchase' AND e.tus >= t0s.t0
        |      THEN e.tus END) AS tp
        | FROM e JOIN t0s USING (user_id) GROUP BY e.user_id),
        |durs AS (
        | SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 3600000000
        |        ELSE (tl - t0) // 3600000000 END AS t_hours,
        |  CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        | FROM subj),
        |grid AS (
        | SELECT t_hours, CAST(sum(ev) AS BIGINT) AS n_event,
        |  CAST(sum(1 - ev) AS BIGINT) AS n_censored,
        |  CAST(count(*) AS BIGINT) AS n_obs
        | FROM durs GROUP BY t_hours),
        |risk AS (
        | SELECT *,
        |  CAST(sum(n_obs) OVER () -
        |   (sum(n_obs) OVER (ORDER BY t_hours ROWS BETWEEN UNBOUNDED
        |     PRECEDING AND CURRENT ROW) - n_obs) AS BIGINT) AS n_risk
        | FROM grid)
        |SELECT t_hours, n_risk, n_event, n_censored,
        | (10000 * n_event) // n_risk AS hazard_bp
        |FROM risk ORDER BY t_hours""".stripMargin,
    // same truncating integral division (`//` ≡ Spark `div`, both toward
    // zero, verified incl. negatives) on the same cents grid
    // same rebased-seconds grid, same RANGE frame; the window sums run in
    // HUGEINT on the oracle side — certificate digits match the DECIMAL(38,0)
    "q217_rolling_ols" ->
      """WITH ev AS (
        | SELECT event_id, event_type,
        |  (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events)) // 1000000
        |    AS trel,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        | FROM events),
        |win AS (
        | SELECT event_id, event_type, trel,
        |  count(*) OVER w AS n_win,
        |  sum(trel::HUGEINT) OVER w AS sx, sum(v::HUGEINT) OVER w AS sy,
        |  sum(trel::HUGEINT * v) OVER w AS sxy,
        |  sum(trel::HUGEINT * trel) OVER w AS sxx
        | FROM ev
        | WINDOW w AS (PARTITION BY event_type ORDER BY trel
        |   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, trel,
        | CAST(n_win AS BIGINT) AS n_win,
        | CAST(n_win * sxy - sx * sy AS VARCHAR) AS slope_num,
        | CAST(n_win * sxx - sx * sx AS VARCHAR) AS slope_den
        |FROM win ORDER BY event_type, trel, event_id""".stripMargin,
    // same QI grid discipline as q169, one level coarser; diversity is a
    // distinct-count, risk shares integer basis points
    "q212_l_diversity" ->
      """WITH qi AS (
        | SELECT c_mktsegment AS segment, c_nationkey AS nation,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000
        |    AS sensitive
        | FROM customer),
        |cls AS (SELECT segment, nation, count(*) AS cls,
        |         count(DISTINCT sensitive) AS ldiv
        |        FROM qi GROUP BY 1, 2),
        |ls AS (SELECT CAST(unnest([2, 3, 5]) AS BIGINT) AS l)
        |SELECT l,
        | CAST(count(*) AS BIGINT) AS n_classes,
        | CAST(sum(CASE WHEN ldiv < l THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
        | CAST(sum(cls) AS BIGINT) AS n_rows,
        | CAST(sum(CASE WHEN ldiv < l THEN cls ELSE 0 END) AS BIGINT) AS rows_at_risk,
        | CAST(CAST(sum(CASE WHEN ldiv < l THEN cls ELSE 0 END) AS BIGINT) * 10000
        |   // CAST(sum(cls) AS BIGINT) AS BIGINT) AS risk_bp
        |FROM cls CROSS JOIN ls GROUP BY l ORDER BY l""".stripMargin,
    "q169_kanon_audit" ->
      """WITH qi AS (
        | SELECT c_mktsegment AS segment, c_nationkey AS nation,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000
        |    AS bal_band
        | FROM customer),
        |cls AS (SELECT segment, nation, bal_band, count(*) AS cls
        |        FROM qi GROUP BY 1, 2, 3),
        |ks AS (SELECT CAST(unnest([2, 5, 10, 20]) AS BIGINT) AS k)
        |SELECT k,
        | CAST(count(*) AS BIGINT) AS n_classes,
        | CAST(sum(CASE WHEN cls < k THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
        | CAST(sum(cls) AS BIGINT) AS n_rows,
        | CAST(sum(CASE WHEN cls < k THEN cls ELSE 0 END) AS BIGINT) AS rows_at_risk,
        | CAST(CAST(sum(CASE WHEN cls < k THEN cls ELSE 0 END) AS BIGINT) * 10000
        |   // CAST(sum(cls) AS BIGINT) AS BIGINT) AS risk_bp
        |FROM cls CROSS JOIN ks GROUP BY k ORDER BY k""".stripMargin,
    // same unique composite ordering key (2e19 > the full 2^64 long span,
    // so the key orders (c, id) lexicographically for ANY long id);
    // DuckDB's arg_max/arg_min are the same argmax aggregates
    "q261_argmax_aggregates" ->
      """WITH e AS (
        | SELECT event_type, event_id,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT)
        |    * 20000000000000000000::HUGEINT + event_id AS key
        | FROM events)
        |SELECT event_type,
        | CAST(arg_max(event_id, key) AS BIGINT) AS max_event_id,
        | CAST(arg_min(event_id, key) AS BIGINT) AS min_event_id,
        | CAST(max(c) AS BIGINT) AS max_c,
        | CAST(min(c) AS BIGINT) AS min_c
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // quantile_disc shares percentile_disc's smallest-cum>=p selection
    // rule (probed) — actual grid elements, zero FP
    "q259_disc_quantiles" ->
      """WITH e AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events)
        |SELECT event_type,
        | CAST(quantile_disc(c, 0.25) AS BIGINT) AS p25_c,
        | CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_c,
        | CAST(quantile_disc(c, 0.75) AS BIGINT) AS p75_c,
        | CAST(quantile_disc(c, 0.95) AS BIGINT) AS p95_c
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // every/any restated as bool_and/bool_or; count_if identical
    "q260_bool_aggregates" ->
      """WITH e AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events)
        |SELECT event_type,
        | bool_and(c >= 0) AS all_nonneg,
        | bool_or(c > 20000) AS any_over_200,
        | bool_and(c < 100000) AS all_under_1000,
        | bool_or(c = 0) AS any_zero,
        | CAST(count_if(c > 5000) AS BIGINT) AS n_over_50
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same regr_* functions, 6-dp rounded (mergeable float aggregates —
    // the q46 discipline)
    "q241_regr_builtins" ->
      """SELECT l_returnflag,
        | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        | round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_r6,
        | round(regr_intercept(l_extendedprice, l_quantity), 6)
        |   AS intercept_r6,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2_r6,
        | round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx_r6,
        | round(regr_avgy(l_extendedprice, l_quantity), 6) AS avgy_r6
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // same doubled tie-rank construction on the value grid; the ppm
    // quantile is one integral division on non-negative operands
    "q236_quantile_normalize" ->
      """WITH g AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |  CAST(count(*) AS BIGINT) AS cnt
        | FROM events GROUP BY 1, 2),
        |w AS (
        | SELECT event_type, c, cnt,
        |  CAST(coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        | FROM g)
        |SELECT event_type, c, cnt,
        | 2 * cum + cnt + 1 AS two_rbar,
        | (2 * cum + cnt + 1) * 1000000 // (2 * (n + 1)) AS u_ppm
        |FROM w ORDER BY event_type, c""".stripMargin,
    // same exact integer sufficient statistics; the one FP reduction is
    // order-pinned via list_reduce over list(... ORDER BY event_type) —
    // the Spark side folds the identical sorted array, so both engines
    // run the same IEEE op sequence on the same integers
    "q219_anova" ->
      """WITH ev AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events),
        |g AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(c AS HUGEINT)) AS s,
        |  sum(CAST(c AS HUGEINT) * c) AS ss
        | FROM ev GROUP BY event_type),
        |one AS (
        | SELECT CAST(count(*) AS BIGINT) AS k_groups,
        |  CAST(coalesce(sum(n), 0) AS BIGINT) AS n_total,
        |  coalesce(sum(s), 0) AS s_total,
        |  coalesce(sum(ss), 0) AS ss_total,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |         ORDER BY event_type)),
        |    (a, b) -> a + b) AS ssb_part
        | FROM g),
        |fin AS (
        | SELECT k_groups, n_total, s_total, ss_total, ssb_part,
        |  ssb_part - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE)
        |    / CAST(n_total AS DOUBLE) AS ssb,
        |  CAST(ss_total AS DOUBLE) - ssb_part AS ssw
        | FROM one)
        |SELECT k_groups, n_total,
        | CAST(s_total AS VARCHAR) AS s_total,
        | CAST(ss_total AS VARCHAR) AS ss_total,
        | round(ssb, 4) AS ssb_r4,
        | round(ssw, 4) AS ssw_r4,
        | round((ssb / CAST(k_groups - 1 AS DOUBLE))
        |   / (ssw / CAST(n_total - k_groups AS DOUBLE)), 6) AS f_r6,
        | round(ssb / (ssb + ssw), 6) AS eta2_r6
        |FROM fin""".stripMargin,
    // same QI grid as q169/q212; both CDFs stay rational with integer
    // numerators, so every prefix term and the final basis-point EMD are
    // integral in both engines
    "q221_t_closeness" ->
      """WITH qi AS (
        | SELECT c_mktsegment AS segment, c_nationkey AS nation,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000
        |    AS band
        | FROM customer),
        |cells AS (SELECT segment, nation, band,
        |           CAST(count(*) AS BIGINT) AS cnt
        |          FROM qi GROUP BY 1, 2, 3),
        |cls AS (SELECT segment, nation, CAST(sum(cnt) AS BIGINT) AS n_c
        |        FROM cells GROUP BY 1, 2),
        |gb AS (SELECT band, CAST(count(*) AS BIGINT) AS g_cnt
        |        FROM qi GROUP BY 1),
        |globcum AS (
        | SELECT band,
        |  CAST(sum(g_cnt) OVER (ORDER BY band
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cumg,
        |  CAST(sum(g_cnt) OVER () AS BIGINT) AS pop_n
        | FROM gb),
        |grid AS (
        | SELECT c.segment, c.nation, g.band, c.n_c, g.cumg, g.pop_n,
        |  coalesce(ce.cnt, 0) AS cnt
        | FROM cls c CROSS JOIN globcum g
        | LEFT JOIN cells ce ON ce.segment = c.segment
        |   AND ce.nation = c.nation AND ce.band = g.band),
        |cum AS (
        | SELECT segment, nation, band, n_c, cumg, pop_n,
        |  CAST(sum(cnt) OVER (PARTITION BY segment, nation ORDER BY band
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cumc
        | FROM grid),
        |per AS (
        | SELECT segment, nation, min(n_c) AS n_rows, min(pop_n) AS pop_n,
        |  CAST(count(*) AS BIGINT) AS n_bands,
        |  CAST(sum(abs(pop_n * cumc - n_c * cumg)) AS BIGINT) AS emd_scaled
        | FROM cum GROUP BY 1, 2)
        |SELECT segment, nation, n_rows, emd_scaled,
        | emd_scaled * 10000 // (n_rows * pop_n * greatest(n_bands - 1, 1))
        |   AS emd_bp,
        | (emd_scaled * 10000 // (n_rows * pop_n * greatest(n_bands - 1, 1)))
        |   > 1500 AS t15_breach
        |FROM per ORDER BY segment, nation""".stripMargin,
    // identical pinned CASE constants; leading digit read off the cents
    // string in both engines
    "q170_benford_audit" ->
      """WITH c AS (
        | SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM orders),
        |dg AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |         AS digit
        |       FROM c WHERE cents > 0),
        |g AS (SELECT digit, count(*) AS n FROM dg GROUP BY digit),
        |w AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM g)
        |SELECT digit, n,
        | CAST(n * 10000 // total AS BIGINT) AS obs_bp,
        | CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
        |  WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669
        |  WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END AS BIGINT) AS exp_bp,
        | abs(CAST(n * 10000 // total AS BIGINT)
        |   - CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
        |      WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669
        |      WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END AS BIGINT)) AS dev_bp
        |FROM w ORDER BY digit""".stripMargin,
    // q167's HUGEINT certificate discipline on the same grids
    "q171_group_ols" ->
      """WITH g AS (
        | SELECT l_returnflag AS grp,
        |  CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT) AS x,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        | FROM lineitem),
        |a AS (SELECT grp, count(*) AS n,
        |  CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
        |  CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy
        | FROM g GROUP BY grp)
        |SELECT grp, n,
        | CAST(sx AS VARCHAR) AS sx, CAST(sy AS VARCHAR) AS sy,
        | CAST(sxx AS VARCHAR) AS sxx, CAST(sxy AS VARCHAR) AS sxy,
        | CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
        |   - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR)
        |   AS slope_num,
        | CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
        |   - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS VARCHAR) AS den,
        | CAST(CAST(sy AS HUGEINT) * CAST(sxx AS HUGEINT)
        |   - CAST(sx AS HUGEINT) * CAST(sxy AS HUGEINT) AS VARCHAR)
        |   AS icept_num
        |FROM a ORDER BY grp""".stripMargin,
    // doubled-rank grid: 2·rank of every occurrence of a distinct value
    // is 2·(rows below) + (ties) + 1 — integers end to end
    "q172_rank_test" ->
      """WITH v AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events WHERE event_type IN ('click', 'view')),
        |p AS (SELECT c,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b
        | FROM v GROUP BY c),
        |r AS (SELECT a, b,
        |  coalesce(sum(a + b) OVER (ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        | FROM p),
        |tt AS (SELECT a, b, 2 * cum + a + b + 1 AS two_r FROM r),
        |st AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2,
        |  CAST(sum(CAST(a AS HUGEINT) * two_r) AS DECIMAL(38,0)) AS r1x2,
        |  CAST(sum(CAST(a + b AS HUGEINT) * (a + b) * (a + b) - (a + b))
        |    AS DECIMAL(38,0)) AS tie_term
        | FROM tt)
        |SELECT n1, n2, CAST(r1x2 AS VARCHAR) AS r1x2,
        | CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS VARCHAR) AS u1x2,
        | CAST(2 * CAST(n1 AS HUGEINT) * n2
        |   - (r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1)) AS VARCHAR) AS u2x2,
        | CAST(tie_term AS VARCHAR) AS tie_term FROM st""".stripMargin,
    "q157_ab_experiment" ->
      """WITH u AS (
        | SELECT user_id,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        | FROM events GROUP BY 1),
        |a AS (
        | SELECT conv,
        |  CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |   THEN 'A' ELSE 'B' END AS arm
        | FROM u),
        |g AS (
        | SELECT
        |  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS x_a,
        |  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS x_b
        | FROM a),
        |r AS (
        | SELECT *,
        |  CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |  CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |  CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pooled
        | FROM g),
        |z AS (
        | SELECT *,
        |  pooled * (1.0 - pooled)
        |   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) AS den
        | FROM r)
        |SELECT n_a, x_a, n_b, x_b, rate_a, rate_b, pooled,
        | CASE WHEN den > 0.0
        |  THEN (rate_a - rate_b) * (rate_a - rate_b) / den END AS z2,
        | CASE WHEN den > 0.0
        |  THEN (rate_a - rate_b) * (rate_a - rate_b) / den
        |    > 3.841458820694124 END AS significant
        |FROM z""".stripMargin,
    // same derived hash family as the Spark side: hb from one md5, row
    // buckets by integer arithmetic — the whole sketch is engine-exact
    "q190_countmin_freq" ->
      s"""WITH $duckCmCounters,
        |top AS (
        | SELECT tok, hb, count(*) AS true_n FROM tk GROUP BY 1, 2
        | ORDER BY true_n DESC, tok LIMIT 30),
        |est AS (
        | SELECT t.tok, t.true_n, min(c.cnt) AS est_n
        | FROM top t CROSS JOIN js
        | JOIN counters c ON c.j = js.j
        |  AND c.bucket = ((t.hb * (2*js.j + 1) + js.j) % 281474976710656) % 512
        | GROUP BY 1, 2)
        |SELECT tok, CAST(true_n AS BIGINT) AS true_n,
        | CAST(est_n AS BIGINT) AS est_n,
        | CAST(est_n - true_n AS BIGINT) AS over_n
        |FROM est ORDER BY true_n DESC, tok""".stripMargin,
    // u32 = first 8 hex digits of the k-th smallest hash, expanded digit
    // by digit (DuckDB has no hex->int cast); est is HUGEINT-exact //
    "q141_kmv_distinct" ->
      """WITH h AS (
        | SELECT lang, md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS h
        | FROM documents),
        |dh AS (SELECT DISTINCT lang, h FROM h WHERE h IS NOT NULL),
        |mink AS (
        | SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        | FROM dh),
        |sk AS (SELECT lang, count(*) AS m, max(h) AS kth
        |  FROM mink WHERE rn <= 64 GROUP BY lang),
        |stats AS (SELECT lang, count(*) AS n_docs, count(DISTINCT h) AS n_distinct
        |  FROM h GROUP BY lang),
        |j AS (
        | SELECT s.lang, s.n_docs, s.n_distinct, k.m, substr(k.kth, 1, 8) AS kth_prefix,
        |  (strpos('0123456789abcdef', substr(k.kth, 1, 1)) - 1) * 268435456
        |  + (strpos('0123456789abcdef', substr(k.kth, 2, 1)) - 1) * 16777216
        |  + (strpos('0123456789abcdef', substr(k.kth, 3, 1)) - 1) * 1048576
        |  + (strpos('0123456789abcdef', substr(k.kth, 4, 1)) - 1) * 65536
        |  + (strpos('0123456789abcdef', substr(k.kth, 5, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(k.kth, 6, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(k.kth, 7, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(k.kth, 8, 1)) - 1) AS u32
        | FROM stats s JOIN sk k USING (lang))
        |SELECT lang, n_docs, n_distinct, kth_prefix,
        | CAST(CASE WHEN m < 64 THEN n_distinct
        |      ELSE 270582939648 // greatest(u32, 1) END AS BIGINT) AS est_distinct
        |FROM j ORDER BY lang""".stripMargin,
    // bottom-k-by-hash sample + integer order-statistic ranks: both
    // engines pick identical rows; exact side from the value histogram
    "q166_sketch_quantiles" ->
      """WITH docs AS (
        | SELECT lang, doc_id, n_chars,
        |  md5('graft-qsketch-42:'
        |    || regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS h
        | FROM documents),
        |samp AS (
        | SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |   row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
        |  FROM docs) WHERE rk <= 64),
        |sv AS (
        | SELECT lang, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rv,
        |  count(*) OVER (PARTITION BY lang) AS m
        | FROM samp),
        |est AS (
        | SELECT lang, max(m) AS m_sample,
        |  max(CASE WHEN rv = (25*m + 99)//100 THEN n_chars END) AS est_p25,
        |  max(CASE WHEN rv = (50*m + 99)//100 THEN n_chars END) AS est_p50,
        |  max(CASE WHEN rv = (90*m + 99)//100 THEN n_chars END) AS est_p90
        | FROM sv GROUP BY lang),
        |nn AS (SELECT lang, count(*) AS n_docs FROM docs GROUP BY lang),
        |cum AS (
        | SELECT lang, n_chars,
        |  sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cum
        | FROM (SELECT lang, n_chars, count(*) AS cnt FROM docs GROUP BY 1, 2)),
        |exa AS (
        | SELECT c.lang, max(n.n_docs) AS n_docs,
        |  min(CASE WHEN cum >= (25*n.n_docs + 99)//100 THEN n_chars END) AS exa_p25,
        |  min(CASE WHEN cum >= (50*n.n_docs + 99)//100 THEN n_chars END) AS exa_p50,
        |  min(CASE WHEN cum >= (90*n.n_docs + 99)//100 THEN n_chars END) AS exa_p90
        | FROM cum c JOIN nn n USING (lang) GROUP BY c.lang)
        |SELECT e.lang, x.n_docs, e.m_sample,
        | e.est_p25, e.est_p50, e.est_p90, x.exa_p25, x.exa_p50, x.exa_p90
        |FROM est e JOIN exa x ON e.lang = x.lang ORDER BY e.lang""".stripMargin,
    // same integer grid, HUGEINT row products (int128 ≡ the BIGINT-safe
    // products Spark uses), DECIMAL(38,0) sums — certificate math in
    // HUGEINT then cast back for output parity
    "q167_corr_matrix" -> {
      val sqlAggs =
        corrCols.map { case (n, _) =>
          s"CAST(sum(CAST($n AS HUGEINT)) AS DECIMAL(38,0)) AS s_$n" } ++
          corrCols.map { case (n, _) =>
            s"CAST(sum(CAST($n AS HUGEINT) * $n) AS DECIMAL(38,0)) AS ss_$n" } ++
          corrPairs.map { case (a, b) =>
            s"CAST(sum(CAST($a AS HUGEINT) * $b) AS DECIMAL(38,0)) AS sp_${a}_$b" }
      val branches = corrPairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y, n,
           | s_$a AS sx, s_$b AS sy, ss_$a AS sxx, ss_$b AS syy,
           | sp_${a}_$b AS sxy FROM a""".stripMargin
      }.mkString("\n UNION ALL\n")
      s"""WITH q AS (
         | SELECT ${corrCols.map { case (n, c) =>
        s"CAST(CAST($c AS DECIMAL(18,4)) * 10000 AS BIGINT) AS $n" }.mkString(",\n  ")}
         | FROM lineitem),
         |a AS (SELECT count(*) AS n, ${sqlAggs.mkString(",\n  ")} FROM q),
         |m AS (
         |$branches)
         |SELECT col_x, col_y, n,
         | CAST(sx AS VARCHAR) AS sx, CAST(sy AS VARCHAR) AS sy,
         | CAST(sxx AS VARCHAR) AS sxx, CAST(syy AS VARCHAR) AS syy,
         | CAST(sxy AS VARCHAR) AS sxy,
         | CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
         |   - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR) AS num,
         | CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
         |   - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS VARCHAR) AS den_x,
         | CAST(CAST(n AS HUGEINT) * CAST(syy AS HUGEINT)
         |   - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR) AS den_y
         |FROM m ORDER BY col_x, col_y""".stripMargin
    },
    "q129_column_entropy" ->
      """WITH vals AS (
        | SELECT 'documents.lang' AS col_name, lang AS val FROM documents
        | UNION ALL SELECT 'documents.source', source FROM documents
        | UNION ALL SELECT 'events.event_type', event_type FROM events),
        |c AS (SELECT col_name, val, count(*) AS c FROM vals GROUP BY 1, 2),
        |l AS (SELECT col_name, c,
        |  CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lnc FROM c)
        |SELECT col_name, CAST(sum(c) AS BIGINT) AS n,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | CAST(CAST(round(ln(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)), 6)
        |    AS DECIMAL(18,6)) AS DOUBLE)
        |  - CAST(sum(c * lnc) AS DOUBLE) / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)
        |  AS entropy_nats
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "q121_bootstrap_se" ->
      """WITH p AS (
        | SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        | FROM events WHERE event_type = 'purchase'),
        |r AS (
        | SELECT p.event_id, p.c, b.b
        | FROM p CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b),
        |ku AS (
        | SELECT c, b,
        |  substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8) AS u
        | FROM r),
        |k AS (
        | SELECT b, c,
        |  CASE WHEN u < '5e2d58d8' THEN 0 WHEN u < 'bc5ab1b1' THEN 1
        |   WHEN u < 'eb715e1d' THEN 2 WHEN u < 'fb239797' THEN 3
        |   WHEN u < 'ff1025f5' THEN 4 WHEN u < 'ffd90f3b' THEN 5
        |   WHEN u < 'fffa8b71' THEN 6 WHEN u < 'ffff540c' THEN 7
        |   WHEN u < 'ffffed1f' THEN 8 ELSE 9 END AS k
        | FROM ku),
        |g AS (
        | SELECT b, CAST(sum(k) AS BIGINT) AS n_eff,
        |  coalesce(sum(k::HUGEINT * c), 0) AS sc
        | FROM k GROUP BY 1),
        |m AS (
        | SELECT b, n_eff,
        |  CASE WHEN n_eff > 0 THEN (sc * 100) // n_eff END AS mbu
        | FROM g),
        |x AS (
        | SELECT b, n_eff, mbu, sum(mbu) OVER () // 32 AS mbar_u
        | FROM m)
        |SELECT b, n_eff,
        | CAST(mbu // 100 AS DOUBLE) / 100.0 AS mean_value,
        | sqrt(CAST(sum((mbu - mbar_u) * (mbu - mbar_u)) OVER ()
        |   AS DOUBLE) / 31.0) / 10000.0 AS se_value
        |FROM x ORDER BY b""".stripMargin,
    "q115_distribution_drift" ->
      """WITH c AS (
        | SELECT lang,
        |  CAST(sum(CASE WHEN substr(md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), 1, 1) < 'c' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |  CAST(sum(CASE WHEN substr(md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), 1, 1) < 'c' THEN 0 ELSE 1 END) AS BIGINT) AS b
        | FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb FROM c),
        |x AS (
        | SELECT lang, a, b, ta, tb,
        |  CASE WHEN a > 0 THEN CAST(round(ln(CAST(2*a*tb AS DOUBLE)
        |    / CAST(a*tb + b*ta AS DOUBLE)), 6) AS DECIMAL(18,6))
        |   ELSE CAST(0 AS DECIMAL(18,6)) END AS l1,
        |  CASE WHEN b > 0 THEN CAST(round(ln(CAST(2*b*ta AS DOUBLE)
        |    / CAST(a*tb + b*ta AS DOUBLE)), 6) AS DECIMAL(18,6))
        |   ELSE CAST(0 AS DECIMAL(18,6)) END AS l2
        | FROM c CROSS JOIN t)
        |SELECT lang, a AS n_train, b AS n_eval,
        | CAST(a*l1 AS DOUBLE)/(2.0*CAST(ta AS DOUBLE))
        |  + CAST(b*l2 AS DOUBLE)/(2.0*CAST(tb AS DOUBLE)) AS contrib,
        | CAST(sum(a*l1) OVER () AS DOUBLE)/(2.0*CAST(ta AS DOUBLE))
        |  + CAST(sum(b*l2) OVER () AS DOUBLE)/(2.0*CAST(tb AS DOUBLE)) AS js_total
        |FROM x ORDER BY lang""".stripMargin,
    "q116_iqr_clip" ->
      """WITH e AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 32 AS v32
        | FROM events),
        |f AS (
        | SELECT event_type,
        |  CAST(quantile_cont(v32, 0.25) * 32 AS BIGINT) AS q1x,
        |  CAST(quantile_cont(v32, 0.75) * 32 AS BIGINT) AS q3x
        | FROM e GROUP BY 1),
        |g AS (
        | SELECT event_type, q1x, q3x,
        |  q1x - (3 * (q3x - q1x)) // 2 AS lox,
        |  q3x + (3 * (q3x - q1x)) // 2 AS hix
        | FROM f)
        |SELECT e.event_type, count(*) AS n,
        | CAST(any_value(q1x) AS DOUBLE) / 102400.0 AS q1,
        | CAST(any_value(q3x) AS DOUBLE) / 102400.0 AS q3,
        | CAST(any_value(lox) AS DOUBLE) / 102400.0 AS fence_lo,
        | CAST(any_value(hix) AS DOUBLE) / 102400.0 AS fence_hi,
        | count(*) FILTER (e.v32 * 32 < lox) AS n_clip_lo,
        | count(*) FILTER (e.v32 * 32 > hix) AS n_clip_hi,
        | CAST(sum(greatest(lox, least(hix, e.v32 * 32))) AS DOUBLE) / 102400.0
        |   AS sum_winsorized
        |FROM e JOIN g USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q110_heavy_hitters" ->
      """WITH t AS (
        | SELECT unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+')) AS token
        | FROM documents),
        |n AS (SELECT count(*) AS n_tokens FROM t)
        |SELECT token, count(*) AS cnt,
        | CAST(count(*) AS DOUBLE) / CAST((SELECT n_tokens FROM n) AS DOUBLE)
        |   AS share
        |FROM t GROUP BY token
        |HAVING count(*) * 64 > (SELECT n_tokens FROM n)
        |ORDER BY cnt DESC, token""".stripMargin,
    "q103_robust_outliers" ->
      """WITH e AS (
        | SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM events),
        |m AS (SELECT event_type, median(cents) AS med_c, count(*) AS n
        |  FROM e GROUP BY 1),
        |j AS (SELECT e.event_type, abs(e.cents - m.med_c) AS adev
        |  FROM e JOIN m USING (event_type)),
        |md AS (SELECT event_type, median(adev) AS mad_c FROM j GROUP BY 1)
        |SELECT m.event_type, m.n, m.med_c / 100.0 AS med, md.mad_c / 100.0 AS mad,
        | (SELECT count(*) FROM j
        |   WHERE j.event_type = m.event_type AND j.adev > 4.4478 * md.mad_c)
        |   AS n_outliers
        |FROM m JOIN md USING (event_type) ORDER BY m.event_type""".stripMargin,
    "q104_chi2_independence" ->
      """WITH c AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |l AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rl FROM c GROUP BY 1),
        |s AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs FROM c GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM c),
        |g AS (
        | SELECT grid.lang, grid.source, coalesce(c.o, 0) AS o,
        |  CAST(grid.rl::HUGEINT * grid.cs AS DOUBLE) / CAST(grid.nn AS DOUBLE) AS e
        | FROM (SELECT l.lang, s.source, rl, cs, nn
        |       FROM l CROSS JOIN s CROSS JOIN n) grid
        | LEFT JOIN c ON grid.lang = c.lang AND grid.source = c.source),
        |x AS (
        | SELECT lang, source, o, e,
        |  CAST(floor((o - e) * (o - e) / e * 1000000) AS BIGINT) AS contrib_u
        | FROM g)
        |SELECT lang, source, o,
        | CAST(floor(e * 1000000) AS DOUBLE) / 1000000 AS n_exp,
        | CAST(contrib_u AS DOUBLE) / 1000000 AS contrib,
        | CAST(CAST(sum(contrib_u) OVER () AS BIGINT) AS DOUBLE) / 1000000
        |   AS chi2_total
        |FROM x ORDER BY lang, source""".stripMargin,
    "q85_value_histogram" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        | CAST(floor(value / 10.0) AS BIGINT) * 10.0 AS bin_lo,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q45_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q46_moments" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_extendedprice), 4) AS sd_price,
        | round(var_samp(l_quantity), 4) AS var_qty,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q47_collect_sorted" ->
      """SELECT o_orderstatus,
        | string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        | count(DISTINCT o_orderpriority) AS n_priorities
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q48_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (o_orderstatus = 'F') AS F,
        | count(*) FILTER (o_orderstatus = 'O') AS O,
        | count(*) FILTER (o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q192_unpivot" ->
      """WITH wide AS (
        | SELECT o_orderpriority,
        |  CAST(count(*) AS DOUBLE) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  max(o_totalprice) AS max_price
        | FROM orders GROUP BY 1)
        |SELECT o_orderpriority, metric, val
        |FROM wide UNPIVOT (val FOR metric IN (n_orders, sum_price, max_price))
        |ORDER BY o_orderpriority, metric""".stripMargin,
    "q49_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        | SELECT unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+')) AS token
        | FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q50_udaf_stats" ->
      """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q51_udf_rank" ->
      """SELECT priority_rank, count(*) AS n FROM (
        | SELECT CAST(split_part(o_orderpriority, '-', 1) AS INT) AS priority_rank
        | FROM orders)
        |WHERE priority_rank <= 2
        |GROUP BY priority_rank ORDER BY priority_rank""".stripMargin)
}
