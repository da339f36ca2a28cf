package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      case Some(_) => df.withColumn(
        "ts", org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts AS TIMESTAMP)) * CAST(1000 AS BIGINT)"))
      case None => df
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
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= n) df
    else df.repartition(n, col(key))
  }

  /** Register every table as a temp view, for the spark.sql query surface. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
