package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the PRE-SHUFFLED JOIN surface: a table written
  * with `bucketBy(n, key)` is hash-partitioned on disk, so every future
  * equi-join or aggregation on that key reads co-located buckets instead of
  * shuffling the fact table again. This is the standard answer to "the same
  * 100 TB join runs nightly": pay the key shuffle ONCE at write time, then
  * every downstream join of two same-bucketed tables plans ZERO exchanges —
  * bucket i of the left joins bucket i of the right, file against file.
  * `sortBy(key)` additionally persists the in-bucket order a sort-merge
  * join needs, making the steady-state plan scan → (sort) → merge with no
  * exchange on either side (the spec pins the exchange-free shape).
  *
  * Scale notes:
  *  - bucket count is a layout contract: both sides must agree (Spark
  *    joins n-bucket to n-bucket without exchange; mismatched counts
  *    re-shuffle the smaller side). Pick buckets ≈ cluster cores at the
  *    target SF, not per-job.
  *  - bucketed writes produce one file per (task, bucket); write with the
  *    key as the repartition column first so each task holds whole buckets
  *    and the layout stays one-file-per-bucket (enables sort elision).
  *
  * The reference's sink is a single coalesced parquet file
  * (`/root/reference/src/main.rs:119-131` writes one object) — bucketing is
  * the additive layout layer a warehouse puts on top. */
object BucketingOps {

  /** Write `df` as a bucketed, bucket-sorted external parquet table
    * registered in the session catalog (bucketing metadata lives in the
    * catalog, which is why this is `saveAsTable` and not `save`). The
    * pre-`repartition` on the key keeps one file per bucket. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Equi-join two same-bucketed catalog tables on their bucket key. The
    * merge hint pins sort-merge (a broadcast would hide the layout win
    * being demonstrated); with matching bucket counts the planner emits no
    * exchange on either side. */
  def coLocatedJoin(s: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    s.table(left).hint("merge").join(s.table(right).hint("merge"), Seq(key))
}
