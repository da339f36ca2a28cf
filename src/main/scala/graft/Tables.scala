package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Loaders for the driver-generated test tables (TESTDATA.md, FIXTURES.md §B):
  * a TPC-H-ish star schema plus `events` / `documents` / `embeddings`, one
  * parquet file per table under a scale-factor directory.
  *
  * All engine queries read through here so the scan path is uniform: parquet
  * with embedded schema (no inference drift across SFs — SURVEY.md §7.4),
  * vectorized reader, and Catalyst pushdown/pruning apply automatically.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The engine-wide `events.ts` contract is a raw nanosecond Long (every
    * consumer derives µs as `ts div 1000`). Driver testdata has shipped the
    * column both ways — TIMESTAMP(NANOS) parquet (a Long under
    * `nanosAsLong`) and TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ) — so
    * the loader pins the contract here instead of spreading type switches
    * across every query. The NTZ wall-clock → epoch conversion is exact
    * because every graft session pins spark.sql.session.timeZone=UTC
    * (Graft.sessionBuilder / TestSpark). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) => df
      case Some(_) =>
        requireUtc(df.sparkSession)
        df.withColumn(
          "ts", org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts AS TIMESTAMP)) * CAST(1000 AS BIGINT)"))
      case None => df
    }

  /** The NTZ→epoch conversion above is only exact under a UTC session
    * timezone; every graft entry point pins it, but a session built
    * outside Graft.sessionBuilder/TestSpark would otherwise get uniformly
    * SHIFTED event times with no error. Fail loudly instead. */
  private[graft] def requireUtc(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events.ts normalization requires spark.sql.session.timeZone=UTC " +
        s"(got '$tz') — build sessions via Graft.sessionBuilder")
  }

  /** Hash-repartition `df` on `key` before a COMPUTE-heavy per-row stage.
    *
    * Scan parallelism is sized by BYTES (`files.maxPartitionBytes`), so a
    * small-but-expensive table — a 600 KB documents file whose every row
    * feeds a shingle/minhash/simhash signature build — arrives as ONE
    * input split, and the signature stage runs serially no matter how many
    * cores exist (measured: 2.7 s single-task gram builds dominating q113
    * at sf0.1). One narrow exchange of the raw rows buys stage-wide
    * parallelism for everything downstream, and lands the table hash-
    * partitioned on its join key, which the verify-attach joins reuse.
    * The partition count is pinned (not AQE-advisory) because the byte
    * size that fooled the scan sizing would fool the coalescer the same
    * way. When the layout already yields enough splits — the 100 TB case —
    * the exchange would be pure waste, so it is SKIPPED: the split count
    * is read off the planned scan and the repartition only fires when the
    * layout starves the compute (fewer splits than the shuffle width). */
  def spread(df: DataFrame, key: String): DataFrame = {
    // typed accessor (numShufflePartitions), not a raw-string .toInt —
    // survives distributions that set the conf non-numerically ("auto")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df
    else df.repartition(n, col(key))
  }

  /** Final-select export guard: NO DecimalType column may reach a query's
    * output parquet. The driver's correctness hasher reads Spark parquet
    * decimals exactly (decimal128 → Decimal) while its DuckDB oracle side
    * renders them as float64 (scientific notation above ~15 digits, NaN for
    * NULLs), so a decimal output column can never hash-match even when the
    * values are bit-exact — round 5 shipped 13 value-exact queries that all
    * failed on exactly this. The rule: integer certificates (scale == 0)
    * export as STRING (exact above 2^53 — q167's sxx hits 3.3e26 — matching
    * `CAST(... AS VARCHAR)` in the oracle, plain digits in both engines);
    * fractional decimals export as DOUBLE matching `CAST(... AS DOUBLE)`.
    * The double path is engine-identical ONLY while unscaled values stay
    * within 2^53 (Spark rounds the exact decimal once; DuckDB converts the
    * int128 then divides — a second rounding that can land 1 ulp away
    * beyond 2^53). Today's only fractional consumer is q106's money
    * (cents ≪ 2^53); a wider fractional certificate must pre-divide on its
    * integer grid or export a string. Applied as the LAST projection so all
    * internal arithmetic, comparisons, and ordering stay on the exact
    * decimal grid; a narrow projection preserves the sorted output order. */
  /** Truncating integral division on DECIMAL operands, DECIMAL-valued.
    * Spark's `div` always returns LONG (a quotient past 2^63 overflows);
    * this stays on the decimal grid: (a − a % b) / b is exactly trunc(a/b)
    * — Remainder keeps the dividend's sign in both engines, so the
    * difference is exactly divisible and the decimal division exact —
    * matching DuckDB's `//` on HUGEINT (verified truncating, negatives
    * included). Width certificate: Spark's decimal division carries a
    * 6-digit minimum scale, so the quotient is exact only while it fits
    * DECIMAL(38,6) — |quotient| < 10³² (every caller's quotient is
    * ≤ ~10²² today; PropertySpec pins ±10²² against BigInt). */
  def decTruncDiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast(org.apache.spark.sql.types.DecimalType(38, 0))

  def portable(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    if (!df.schema.exists(_.dataType.isInstanceOf[DecimalType])) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case dt: DecimalType if dt.scale == 0 =>
          col(f.name).cast("string").as(f.name)
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Register every table as a temp view, for the spark.sql query surface. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
