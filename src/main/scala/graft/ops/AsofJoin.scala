package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join, composed from built-in operators (preference (a) of
  * the custom-operator ladder: union + window expresses the semantics exactly,
  * so no Catalyst extension is needed).
  *
  * Semantics: for every left row, attach the columns of the single right row
  * with the same `key` and the greatest `time` that is <= the left row's
  * `time` (DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.time >= r.time`).
  *
  * Plan shape & scale: both sides are unioned and processed by ONE window
  * (shuffle on `key`, sort by (time, side)). That is a single sort-merge pass
  * — the same cost profile as a sort-merge join — instead of the naive
  * range join (O(n*m) per key) that a direct `l.time >= r.time` join
  * condition would plan. Skewed keys behave like any window skew (AQE-sized
  * partitions; salt the key upstream if one entity dominates).
  */
object AsofJoin {

  /** @param attach right-side column names to carry onto left rows; must not
    *               collide with left column names. The attach columns travel
    *               as ONE struct so a NULL inside a matched right row is
    *               preserved as-is — filling per-column would stitch values
    *               from different right rows (and diverge from ASOF JOIN).
    */
  def backward(left: DataFrame, right: DataFrame, key: String, time: String,
               attach: Seq[String]): DataFrame = {
    val payload = left.columns.toSeq.filterNot(c => c == key || c == time)
    val attachStructType = org.apache.spark.sql.types.StructType(
      attach.map(c => right.schema(c).copy(name = c)))
    // Right rows sort BEFORE left rows at equal time (side 0 < 1) so an
    // exactly-simultaneous right row is visible to the left row (>= contract).
    val taggedLeft = left.select(
      Seq(col(key), col(time).as("_t"), lit(1).as("_side")) ++
        payload.map(col) :+
        lit(null).cast(attachStructType).as("_attach"): _*)
    val taggedRight = right.select(
      Seq(col(key), col(time).as("_t"), lit(0).as("_side")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(attach.map(col): _*).as("_attach"): _*)
    // _attach as the final sort key pins the pick among right rows that tie
    // on (key, time) — deterministic (struct ordering: max attach tuple wins)
    // instead of partition-order-dependent
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"), col("_attach"))
      .rowsBetween(Window.unboundedPreceding, 0)
    taggedLeft.unionByName(taggedRight)
      .select(Seq(col(key), col("_t"), col("_side")) ++
        payload.map(col) :+
        last(col("_attach"), ignoreNulls = true).over(w).as("_attach"): _*)
      .filter(col("_side") === 1)
      .withColumn(time, col("_t"))
      .select(Seq(col(key), col(time)) ++ payload.map(col) ++
        attach.map(c => col(s"_attach.$c").as(c)): _*)
  }
}
