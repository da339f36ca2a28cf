package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases automatically (enabled in
  * every session here); these utilities cover the two shapes AQE cannot fix:
  * a skewed AGGREGATION (one giant group serializes into one task) and a
  * skewed join where the hot-key set is known up front.
  *
  * The salt MUST be a deterministic function of the row's own values —
  * never monotonically_increasing_id/rand/spark_partition_id, which depend
  * on partition assignment and in-partition order. After a shuffle those
  * change between task ATTEMPTS, so a fetch-failure retry can re-salt a
  * row: reducer (key, salt=2) aggregates the first attempt's copy while
  * reducer (key, salt=5) gets the recomputation's — the row counts twice,
  * or zero times (the SPARK-23207 correctness class; invisible in
  * single-attempt local runs, which is exactly why it's pinned here).
  * A row-value hash is attempt-stable. The price: IDENTICAL duplicate rows
  * share a salt, so a hot key whose rows are byte-identical copies does
  * not spread — dedup or pre-count those upstream (a groupBy on all
  * columns), which is cheaper than the skewed aggregate anyway.
  */
object SkewUtils {

  /** Deterministic per-row salt in [0, buckets): a hash of every column
    * value, stable across task attempts (see object doc). */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets))

  /** Two-phase aggregation for skewed group keys: a deterministic salt
    * splits each group into `buckets` partial groups (map-side + first
    * shuffle distribute the hot key over `buckets` tasks), then the partials
    * merge in a second, tiny aggregation.
    *
    * `partials`: per-(key, salt) partial aggregates; `merge`: how to combine
    * partial columns (must be the algebraic merge of the partial, e.g.
    * partial count -> sum of counts).
    */
  def saltedAgg(df: DataFrame, key: Column, buckets: Int,
                partials: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(df, buckets))
    salted.groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("_key"))
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for a known skewed left side: left rows get a
    * deterministic salt in [0, buckets); the (small) right side is exploded
    * `buckets` times so every salted left partition finds its match.
    * Right-side amplification x buckets is the price — use only when the
    * right side is broadcast-sized but the join key is too skewed for a
    * plain shuffle. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(left, buckets))
    val explodedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLeft.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }
}
