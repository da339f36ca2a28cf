package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ADVERSARIAL EDGE-CORPUS generator (round-11 VERDICT item 1): every
  * defect the round-9/10 hand-review passes found came from an input
  * shape the graded corpus never exercises — empty tables, single-row
  * tables, all-NULL `documents.text`, single-word (and NULL) `p_name`s,
  * single-candidate similarity pools, tie-saturated keys, and values
  * parked at the widened-overflow boundaries. This generator makes those
  * shapes a STANDING corpus with the graded tables' exact schemas, so
  * EdgeCorpusSpec can replay all registered queries against the DuckDB
  * oracle on them inside `sbt test` — the manual review pass that found
  * ~21 bugs in two rounds, converted into a gate.
  *
  * Four flavors; the first three are pure literals (no Random, no
  * timestamps — rerunning regenerates byte-identical parquet):
  *  - `empty`: all ten tables present, zero rows (schema-exact — the
  *    0-row projection of `single`, so the two flavors can never drift);
  *  - `single`: exactly one row per table, FK-consistent — every
  *    per-group operator sees groups of one, every join sees at most one
  *    match, every window sees a frame of one;
  *  - `adversarial`: tens of rows per table hitting the shapes above;
  *  - `skewed` (round-12, VERDICT r11 item 3): a deterministic hot-key /
  *    hot-block rewrite of the driver's sf0.001 corpus ([[SkewSource]]) —
  *    GenSkew's fact-key skew (40% of events/orders/lineitem rows onto 3
  *    hot keys) PLUS hot text blocks: 30% of documents rewritten to a
  *    shared boilerplate body (7 near-identical variants — shingle and
  *    simhash-chunk blocks blow past DedupOps.HotBucketDf) and 60% of
  *    part names rewritten to DISTINCT names sharing one blocking noun.
  *    Every [[ops.DedupOps.saltedBlockSides]]/ppjoin salt path then runs
  *    with fanout > 1 THROUGH the DuckDB oracle replay, instead of only
  *    in unit specs (EdgeCorpusSpec asserts the fanout via
  *    [[ops.DedupOps.saltFanoutAudit]]).
  *
  * `runMain graft.GenEdge <baseDir>` writes all four under
  * `<baseDir>/{empty,single,adversarial,skewed}/<table>.parquet`
  * (`skewed` is skipped with a note if [[SkewSource]] is absent).
  */
object GenEdge {

  val Flavors: Seq[String] = Seq("empty", "single", "adversarial", "skewed")

  /** The driver-testdata dir the `skewed` flavor rewrites (TESTDATA.md
    * layout; smallest SF — the gate replays every query on the result).
    * The ROOT comes from SPARK_GRAFT_TESTDATA (r12 ADVICE: a hardcoded
    * absolute path in main sources made every gate keyed on it silently
    * assume-skip on any box without /root/testdata), defaulting to the
    * driver's layout; [[TestData.require]] decides fail-vs-cancel when
    * the dir is absent. */
  val TestdataRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  val SkewSource = s"$TestdataRoot/sf0.001"
  // the loaders' own list — generator and Tables.load stay in lockstep
  private val TableNames = Tables.names

  // ------------------------------------------------------------ helpers

  /** Cast the assembled literal rows onto the graded column types —
    * empty/single/adversarial all flow through the same projection, so
    * the three flavors' schemas are identical by construction. */
  private def shaped(df: DataFrame, casts: (String, String)*): DataFrame =
    df.select(casts.map { case (n, t) => col(n).cast(t).as(n) }: _*)

  /** 64-dim float vector from a compact spec: `base(i) + bump` at one
    * index. Literal-driven so embeddings stay pure data. */
  private def vec(f: Int => Float): Seq[Float] = (0 until 64).map(f)

  // ------------------------------------------------------------- tables

  /** One FK-consistent row per table — the `single` corpus, and the
    * schema template `empty` projects to zero rows. */
  private def singleTables(s: SparkSession): Map[String, DataFrame] = {
    import s.implicits._
    val region = shaped(Seq((0, "AMERICA")).toDF("r_regionkey", "r_name"),
      "r_regionkey" -> "int", "r_name" -> "string")
    val nation = shaped(Seq((0, "BRAZIL", 0)).toDF("n_nationkey", "n_name", "n_regionkey"),
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int")
    val customer = shaped(
      Seq((1L, "Customer#1", 0, 100.25, "BUILDING"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string")
    val supplier = shaped(
      Seq((1L, "Supplier#1", 0, 55.5)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double")
    val part = shaped(
      Seq((1L, "large widget", "Brand#1", "ECONOMY", 7, 901.0))
        .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double")
    val orders = shaped(
      Seq((1L, 1L, "O", 901.0, "2024-01-15 12:00:00", "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"),
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint", "o_orderstatus" -> "string",
      "o_totalprice" -> "double", "o_orderdate" -> "timestamp",
      "o_orderpriority" -> "string")
    val lineitem = shaped(
      Seq((1L, 1L, 1L, 1, 2.0, 901.0, 0.05, 0.02, "N", "O", "2024-01-20 08:30:00"))
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
          "l_shipdate"),
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
      "l_linenumber" -> "int", "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double", "l_returnflag" -> "string",
      "l_linestatus" -> "string", "l_shipdate" -> "timestamp")
    val events = shaped(
      Seq((1L, "2024-01-10 10:00:00.5", 7L, "click", 12.34, "{\"k\": 1}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string")
    val documents = shaped(
      Seq((1L, "the small table scan", "en", "src0", 20L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint")
    val embeddings = shaped(
      Seq((1L, vec(i => if (i == 0) 1f else 0f), 0))
        .toDF("vec_id", "embedding", "label"),
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")
    Map("region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
      "embeddings" -> embeddings)
  }

  /** The adversarial corpus. Shape inventory (each row exists to hit a
    * defect class a prior round found by hand):
    *  - documents: NULL text (a whole lang whose text is ALL NULL),
    *    empty-string text, whitespace-only text, single-token text,
    *    exact-dup ties, whitespace/case variants that share a normalized
    *    fingerprint, a single-doc lang and a single-doc source
    *    (single-candidate pools — the q208 class), unicode tokens;
    *  - part: single-word and NULL p_name (the q91/q204 ANSI-crash and
    *    null-blocking classes), duplicate names, a 3-word name;
    *  - events: cents values parked at ~1e15 — big enough that every
    *    unwidened cents×weight / cents×1e6 / cents² path overflows a raw
    *    long, small enough that CENT-grid exports stay inside double's
    *    2^53-exact window (DuckDB's wide-int→double cast is not
    *    correctly rounded past it — q134's documented finding — so no
    *    widening could fix a wider double export), negative values
    *    (the q261 key-domain and q172 negative-band classes), value ties
    *    across types, duplicate timestamps, a single-event type and
    *    single-event users, ids past the old 10M argmax cliff;
    *  - lineitem: duplicate FULL rows (bag semantics), an orphan order
    *    key, a part key no part has, prices parked AT the revenue
    *    family's documented DECIMAL(12,4) line-price domain cap
    *    ($99,999,999.99 — TPC-H domain x1000; DuckDB's p1+p2<=38
    *    multiply rule leaves the triple price*(1-disc)*(1+tax) no room
    *    to widen, so the cap is the contract and both engines fail loud
    *    past it). events.value parks higher (the events bullet above)
    *    because its cents paths are integral end-to-end and must simply
    *    be wide enough;
    *  - orders: an order no lineitem references, an orphan o_custkey;
    *  - customer: a customer with no orders, zero/negative balances;
    *  - embeddings: the ZERO vector (cosine undefined), exact-duplicate
    *    vectors (tie similarity), an antipodal pair (cos = −1), a
    *    single-vector label (single-candidate ANN pool). */
  private def adversarialTables(s: SparkSession): Map[String, DataFrame] = {
    import s.implicits._
    val single = singleTables(s)

    val region = shaped(Seq(
      (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"),
      "r_regionkey" -> "int", "r_name" -> "string")
    val nation = shaped(Seq(
      (0, "BRAZIL", 1), (1, "CANADA", 1), (2, "CHINA", 2),
      (3, "FRANCE", 3), (4, "KENYA", 0) // KENYA: no customers, no suppliers
    ).toDF("n_nationkey", "n_name", "n_regionkey"),
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int")
    val customer = shaped(Seq(
      (1L, "Customer#1", 0, 100.25, "BUILDING"),
      (2L, "Customer#2", 0, 0.0, "BUILDING"),      // zero balance, tie segment
      (3L, "Customer#3", 1, -999.99, "AUTOMOBILE"), // negative balance
      (4L, "Customer#1", 2, 100.25, "MACHINERY"),   // duplicate name AND balance
      (5L, "Customer#5", 3, 42.0, "FURNITURE"),     // no orders
      (6L, "Customer#6", 3, 42.0, "HOUSEHOLD")      // no orders, balance tie
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string")
    val supplier = shaped(Seq(
      (1L, "Supplier#1", 0, 55.5),
      (2L, "Supplier#2", 1, 55.5),   // balance tie
      (3L, "Supplier#3", 2, -10.0)   // supplies nothing (no lineitem)
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double")
    val part = shaped(Seq(
      (1L, "large widget", "Brand#1", "ECONOMY", 7, 901.0),
      (2L, "large widget", "Brand#2", "PROMO", 7, 901.0),   // duplicate name
      (3L, "large widget", "Brand#3", "LARGE", 9, 450.5),   // triple-dup name
      (4L, "gizmo", "Brand#1", "ECONOMY", 1, 10.0),         // single-word name
      (5L, "gizmos", "Brand#2", "PROMO", 1, 10.0),          // single-word near-dup of 4
      (6L, null, "Brand#3", "ECONOMY", 3, 25.0),            // NULL name
      (7L, "very large widget", "Brand#1", "LARGE", 50, 99999999.99), // 3 words, price cliff
      (8L, "small widget", "Brand#2", "ECONOMY", 1, 10.0),  // shares noun 'widget'
      (9L, "blue rod", "Brand#3", "PROMO", 2, 20.0)         // lone noun 'rod'
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double")
    val orders = shaped(Seq(
      (1L, 1L, "O", 901.0, "2024-01-15 12:00:00", "1-URGENT"),
      (2L, 1L, "F", 901.0, "2024-01-15 12:00:00", "5-LOW"),   // date+price tie
      (3L, 2L, "P", 0.01, "2024-01-01 00:00:00", "3-MEDIUM"), // span start
      (4L, 3L, "O", 99999999.99, "2024-01-31 23:59:59.999999", "2-HIGH"), // revenue-grid cap (see doc), span end
      (5L, 4L, "F", 50.0, "2024-01-20 06:00:00", "4-NOT SPECIFIED"), // no lineitems
      (6L, 999L, "O", 7.0, "2024-01-10 09:00:00", "1-URGENT")  // orphan custkey
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint", "o_orderstatus" -> "string",
      "o_totalprice" -> "double", "o_orderdate" -> "timestamp",
      "o_orderpriority" -> "string")
    val lineitem = shaped(Seq(
      (1L, 1L, 1L, 1, 2.0, 901.0, 0.05, 0.02, "N", "O", "2024-01-20 08:30:00"),
      (1L, 1L, 1L, 1, 2.0, 901.0, 0.05, 0.02, "N", "O", "2024-01-20 08:30:00"), // EXACT dup row (bag)
      (1L, 2L, 2L, 2, 1.0, 99999999.99, 0.0, 0.0, "A", "F", "2024-01-21 00:00:00"), // revenue-grid cap (see doc)
      (2L, 3L, 1L, 1, 50.0, 450.5, 0.1, 0.08, "R", "F", "2024-01-22 10:00:00"),
      (2L, 4L, 2L, 2, 0.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-22 10:00:00"),    // zero qty, ts tie
      (3L, 999L, 1L, 1, 3.0, 30.0, 0.05, 0.02, "A", "F", "2024-01-05 00:00:00"), // orphan partkey
      (4L, 5L, 2L, 1, 7.0, 70.0, 0.07, 0.01, "R", "O", "2024-01-31 23:59:59"),
      (999L, 1L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-09 12:00:00")   // orphan orderkey
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate"),
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
      "l_linenumber" -> "int", "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double", "l_returnflag" -> "string",
      "l_linestatus" -> "string", "l_shipdate" -> "timestamp")
    val events = shaped(Seq(
      // value ties across types (argmax/rank-test tie saturation), id 0
      (0L, "2024-01-01 00:00:00", 1L, "click", 5.0, "{\"k\": 0}"),
      (1L, "2024-01-01 00:00:00", 1L, "view", 5.0, "{\"k\": 1}"),   // ts tie too
      (2L, "2024-01-01 01:00:00", 1L, "click", 5.0, "{\"k\": 2}"),
      (3L, "2024-01-01 01:00:00", 2L, "view", 5.0, null),           // NULL props
      // the widened-overflow cliff: cents ~ 1e16 (DECIMAL(18,2) edge)
      (4L, "2024-01-02 00:00:00", 2L, "purchase", 9999999999999.99, "{\"k\": 3}"),
      (5L, "2024-01-02 00:00:01", 3L, "purchase", 9999999999999.99, "{k: bad"), // value tie, bad JSON
      // negative values (q261 key domain, q172 negative cents bands)
      (6L, "2024-01-03 12:00:00", 3L, "click", -12345.67, "{}"),
      (7L, "2024-01-03 12:00:00.000001", 4L, "view", -12345.67, "{\"k\": 4}"),
      (8L, "2024-01-04 00:00:00", 4L, "click", 0.0, "{\"k\": 5}"),  // zero value
      (9L, "2024-01-04 00:00:00", 4L, "view", 0.0, "{\"k\": 6}"),
      // ids past the old 10M argmax cliff, value tie with id 4's max
      (10000000007L, "2024-01-05 08:00:00", 5L, "purchase", 9999999999999.99, "{\"k\": 7}"),
      (10000000008L, "2024-01-05 08:00:00", 5L, "error", 1.0, "{\"k\": 8}"),
      // the single-event type (signup appears ONCE) and single-event users
      (11L, "2024-01-06 09:30:00", 6L, "signup", 2.5, "{\"k\": 9}"),
      (12L, "2024-01-07 10:00:00", 7L, "error", 2.5, "{\"k\": 10}"),
      (13L, "2024-01-08 11:00:00", 8L, "click", 0.01, "{\"k\": 11}"),
      // a hot user: one user carries a burst of ties inside one hour
      (14L, "2024-01-09 14:00:00", 9L, "click", 7.0, "{\"k\": 12}"),
      (15L, "2024-01-09 14:10:00", 9L, "click", 7.0, "{\"k\": 13}"),
      (16L, "2024-01-09 14:20:00", 9L, "click", 7.0, "{\"k\": 14}"),
      (17L, "2024-01-09 14:30:00", 9L, "view", 7.0, "{\"k\": 15}"),
      (18L, "2024-01-31 23:59:59.999999", 9L, "purchase", 9999999999998.75, "{\"k\": 16}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string")
    val documents = shaped(Seq(
      // a lang whose text is ALL NULL (the decode-nothing corpus)
      (0L, null, "xx", "srcnull", 0L),
      (1L, null, "xx", "srcnull", 0L),
      // empty and whitespace-only bodies
      (2L, "", "en", "src0", 0L),
      (3L, " \t\n", "en", "src0", 3L),
      // single-token body
      (4L, "hello", "en", "src0", 5L),
      // exact-dup ties (same text, same lang)
      (5L, "the fast key order sort", "en", "src1", 23L),
      (6L, "the fast key order sort", "en", "src1", 23L),
      // whitespace and case variants: SAME normalized fingerprint as 5/6
      (7L, "the\tfast  key\norder\u000Bsort", "en", "src1", 26L),
      (8L, "The FAST key ORDER sort", "en", "src1", 23L),
      // near-dups: one token swapped
      (9L, "spark group query row data slow small filter", "de", "src2", 44L),
      (10L, "spark group query row data slow small merge", "de", "src2", 43L),
      // a single-doc lang AND single-doc source (single-candidate pools)
      (11L, "lone document in its language pool", "ko", "srclone", 34L),
      // unicode tokens
      (12L, "café naïve 中文 тест", "zh", "src2", 14L),
      // one long repetitive body (token-frequency saturation)
      (13L, Seq.fill(40)("spark").mkString(" "), "fr", "src3", 239L),
      // normal filler so per-lang stats have a populated pool
      (14L, "merge join sort table scan filter agg window batch stream", "es", "src3", 58L),
      (15L, "data row column vector hash key value query small big", "es", "src3", 53L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"),
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint")
    val embeddings = shaped(Seq(
      (0L, vec(_ => 0f), 0),                          // ZERO vector: cosine undefined
      (1L, vec(i => if (i == 0) 1f else 0f), 0),      // e0
      (2L, vec(i => if (i == 0) 1f else 0f), 0),      // exact duplicate of 1
      (3L, vec(i => if (i == 0) -1f else 0f), 0),     // antipodal to 1 (cos = -1)
      (4L, vec(i => if (i == 1) 1f else 0f), 1),      // orthogonal basis
      (5L, vec(i => if (i == 1) 2f else 0f), 1),      // same direction, diff norm (cos = 1)
      (6L, vec(i => (i % 3).toFloat - 1f), 2),        // mixed signs
      (7L, vec(i => (i % 3).toFloat - 1f), 3),        // duplicate ACROSS labels
      (8L, vec(i => if (i < 32) 1f else -1f), 9)      // single-vector label (lone ANN pool)
    ).toDF("vec_id", "embedding", "label"),
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")
    Map("region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
      "embeddings" -> embeddings)
  }

  /** The `skewed` corpus: [[SkewSource]] rewritten with hot fact keys AND
    * hot text blocks (doc scaladoc above). All draws hash the row's own
    * primary key (deterministic, rerun-identical — the GenSkew
    * discipline); the oracle replays the SAME parquet, so every rewrite
    * is correctness-neutral by construction and exists purely to push
    * block sizes past the salt thresholds. */
  private def skewedTables(s: SparkSession): Map[String, DataFrame] = {
    def rd(n: String): DataFrame = s.read.parquet(s"$SkewSource/$n.parquet")
    // 30% of docs become one of 7 near-identical boilerplate bodies: the
    // ~150-doc clique shares every 3-gram shingle (df >> HotBucketDf=64)
    // and — because the variant token is 2 of ~29 tokens — votes nearly
    // identical simhash bits, so 16-bit chunk blocks go hot too
    val hotDoc = pmod(xxhash64(lit("skew_doc"), col("doc_id")), lit(100)) < 30
    val boiler = Seq.fill(3)(
      "license header terms apply to this public corpus document").mkString(" ")
    val hotText = concat_ws(" ", lit(boiler), lit("variant token"),
      pmod(xxhash64(lit("skew_var"), col("doc_id")), lit(7)).cast("string"))
    val documents = rd("documents")
      .withColumn("text", when(hotDoc, hotText).otherwise(col("text")))
      .withColumn("n_chars", when(col("text").isNull, col("n_chars"))
        .otherwise(length(col("text")).cast("bigint")))
    // 60% of part names become DISTINCT names sharing the blocking noun
    // "widget" (second word — nounCatalog blocks on it): a ~120-name
    // block, fanout 2, with digit-distance pairs inside levenshtein range
    val hotPart = pmod(xxhash64(lit("skew_part"), col("p_partkey")), lit(100)) < 60
    val hotName = concat(lit("item"), col("p_partkey").cast("string"),
      lit(" widget grade "), pmod(col("p_partkey"), lit(5)).cast("string"))
    val part = rd("part")
      .withColumn("p_name",
        when(col("p_name").isNotNull && hotPart, hotName)
          .otherwise(col("p_name")))
    Map("region" -> rd("region"), "nation" -> rd("nation"),
      "customer" -> rd("customer"), "supplier" -> rd("supplier"),
      "part" -> part, "documents" -> documents,
      "embeddings" -> rd("embeddings"),
      "events" -> GenSkew.skewKey(rd("events"), "user_id", Seq("event_id"), 40),
      "orders" -> GenSkew.skewKey(rd("orders"), "o_custkey",
        Seq("o_orderkey"), 40),
      "lineitem" -> GenSkew.skewKey(rd("lineitem"), "l_orderkey",
        Seq("l_orderkey", "l_linenumber"), 40))
  }

  /** Materialize one flavor under `dir/<table>.parquet` (single files —
    * the driver-testdata layout every query and stream source expects). */
  def write(spark: SparkSession, dir: String, flavor: String): Unit = {
    val tables = flavor match {
      case "empty"       => singleTables(spark).view.mapValues(_.limit(0)).toMap
      case "single"      => singleTables(spark)
      case "adversarial" => adversarialTables(spark)
      case "skewed"      => skewedTables(spark)
      case other => throw new IllegalArgumentException(s"unknown flavor $other")
    }
    TableNames.foreach(t => GenScale.writeSingleFile(tables(t), dir, t))
  }

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val preExisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Flavors.foreach { f =>
      if (f == "skewed" && !new java.io.File(SkewSource).isDirectory)
        println(s"$f: SKIPPED ($SkewSource not present)")
      else {
        write(spark, s"$base/$f", f)
        println(s"$f: written to $base/$f")
      }
    }
    if (!preExisting) spark.stop()
  }
}
