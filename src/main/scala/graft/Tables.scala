package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view, for the spark.sql query surface. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
