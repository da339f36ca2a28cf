package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zipf-KEYED fact-table variant (round-8 VERDICT follow-up): GenScale's
  * replicas keep the source corpus' uniform key distributions, so AQE's
  * skew-join splitting was proven only by a planted unit fixture
  * (SkewExtensionsSpec), never at data volume. This rewrites the three
  * fact tables of an existing testdata dir with HOT KEYS — `hotPct`% of
  * rows re-keyed onto the 3 smallest existing key values, the remainder
  * untouched — and copies the other tables verbatim, so every registered
  * query runs against the output dir:
  *
  *  - events.user_id   → 3 hot users   (q81's user_id joins, q107's
  *                                      per-user windows)
  *  - orders.o_custkey → 3 hot customers (custkey joins/aggregates)
  *  - lineitem.l_orderkey → 3 hot orders (q10's orderkey join)
  *
  * Re-keying targets EXISTING minimum keys, so referential integrity
  * holds and the hot keys are ordinary ids, not sentinels. Draws are
  * xxhash64 of the row's own primary key — deterministic, retry-stable,
  * byte-identical on rerun (the GenScale/GenZipf discipline).
  *
  * `runMain graft.GenSkew <srcDir> <outDir> [hotPct=40]`
  *
  * [[SkewProbe]] then measures the join/agg family on the output with
  * AQE skew handling on vs off.
  */
object GenSkew {

  /** hotPct% of rows (drawn by hashing the row's identifying columns)
    * re-keyed to the 3 smallest existing values of `keyCol`; key dtype
    * preserved. The hot keys are looked up, not derived as lo+0..2 — a
    * sparse key space would otherwise re-key rows onto values that exist
    * in no dimension row and silently void the referential-integrity
    * guarantee. `idCols` must identify a row (a non-unique draw key would
    * re-key whole equivalence classes at once). */
  private[graft] def skewKey(df: DataFrame, keyCol: String,
                             idCols: Seq[String], hotPct: Int): DataFrame = {
    val keyType = df.schema(keyCol).dataType
    // integral keys only: a non-castable type would turn into nulls that
    // survive the length check while corrupting the re-key, and a null key
    // sorts FIRST under orderBy — it would enter the hot set and NPE on
    // getLong. Guard the type, drop the nulls.
    require(Seq("tinyint", "smallint", "int", "bigint")
        .contains(keyType.simpleString),
      s"$keyCol must be an integral column (got ${keyType.simpleString})")
    val hot = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long")).distinct()
      .orderBy(col(keyCol)).limit(3).collect().map(_.getLong(0))
    require(hot.length == 3, s"need >= 3 distinct non-null $keyCol values")
    val ids = idCols.map(col)
    df.withColumn(keyCol,
      when(pmod(xxhash64((lit("skew_draw") +: ids): _*), lit(100)) < hotPct,
        element_at(
          array(hot.map(lit): _*),
          (pmod(xxhash64((lit("skew_hot") +: ids): _*), lit(3)) + 1)
            .cast("int"))
          .cast(keyType))
        .otherwise(col(keyCol)))
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val hotPct = args.lift(2).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def wr(df: DataFrame, n: String): Unit =
      GenScale.writeSingleFile(df, out, n)

    Seq("region", "nation", "customer", "supplier", "part",
      "documents", "embeddings").foreach(n => wr(rd(n), n))
    wr(skewKey(rd("events"), "user_id", Seq("event_id"), hotPct), "events")
    wr(skewKey(rd("orders"), "o_custkey", Seq("o_orderkey"), hotPct),
      "orders")
    wr(skewKey(rd("lineitem"), "l_orderkey",
      Seq("l_orderkey", "l_linenumber"), hotPct), "lineitem")

    Tables.names.foreach { n =>
      println(s"$n: ${spark.read.parquet(s"$out/$n.parquet").count()} rows")
    }
    if (!preExisting) spark.stop()
  }
}
