package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver testdata (round-6 VERDICT item
  * 3): replicates an existing SF directory `factor`× with key-shifted
  * copies so the 100×-scale claims can be MEASURED instead of argued.
  * `runMain graft.GenScale <srcDir> <outDir> [factor]` (e.g. sf0.1 × 10 ≈
  * sf1).
  *
  * Replica discipline — chosen so per-query work scales ~linearly and the
  * corpus stays non-degenerate:
  *  - Fact tables (orders, lineitem, events, customer as the scaling dim)
  *    shift their keys by replica × stride (stride = max key + 1), so
  *    copy i's orders reference copy i's customers and every FK stays
  *    valid. Timestamps are UNCHANGED, so date selectivities match the
  *    source SF exactly.
  *  - region/nation/supplier/part stay fixed: dimensions grow slower than
  *    facts in every real warehouse, and a fixed catalog preserves the
  *    broadcast-join design point the engine optimizes for.
  *  - documents: replica 0 keeps the source text verbatim; replica i > 0
  *    prefixes every token with "r<i>·" — within-replica near-dup
  *    structure is IDENTICAL to the source corpus while cross-replica
  *    token sets are disjoint, so dedup pair counts scale exactly ×factor
  *    (10 verbatim copies would instead square the pair mass into a
  *    pathological mega-clique corpus that measures nothing). The "·"
  *    terminator makes the replica id self-delimiting ("r1·" + "1·x" can
  *    never equal "r11·" + "x"), and because a source token could still
  *    adversarially start with "r<digits>·", the generator ASSERTS the
  *    disjointness it claims after writing: distinct output tokens must
  *    equal factor × distinct source tokens.
  *  - embeddings: replica i > 0 jitters each component by a deterministic
  *    hash draw in ±0.01, preserving geometry (no exact-tie degeneracy,
  *    no duplicate vectors).
  * Everything is deterministic — no Random, no timestamps — so re-running
  * regenerates byte-identical inputs. */
object GenScale {

  /** The driver layout is one parquet FILE per table (TESTDATA.md), and
    * stream sources select tables with pathGlobFilter("<n>.parquet") —
    * a directory of part-files silently matches NOTHING there (the sf1
    * q225 crash). Write via a temp dir, then move the single part file
    * to the bare `<n>.parquet` path. Shared with [[GenZipf]]. */
  def writeSingleFile(df: DataFrame, out: String, n: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = s"$out/_tmp_$n"
    // 16 MB row groups: a coalesce(1) single file otherwise lands as
    // ONE row group (measured: 6M-row lineitem), and parquet splits
    // assign whole row groups — every scan of the table would be one
    // task no matter what maxPartitionBytes says
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .parquet(tmp)
    import scala.jdk.CollectionConverters._
    // close the directory streams deterministically — each Files.list/walk
    // pins a directory fd until closed, and a generation loop calls this
    // once per table
    val single = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")))
      .getOrElse(sys.error(s"no part file written for $n"))
    Files.createDirectories(Paths.get(out))
    Files.move(single, Paths.get(s"$out/$n.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    FsUtil.deleteRec(Paths.get(tmp))
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // reuse an active session when one exists (GenScaleSpec runs under the
    // shared test session — stopping it there would kill the whole suite)
    val preExisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rd(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def wr(df: DataFrame, n: String): Unit = writeSingleFile(df, out, n)
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).as[Long].head() + 1L

    // fixed catalog dims: verbatim copies
    Seq("region", "nation", "supplier", "part").foreach(n => wr(rd(n), n))

    val custS = stride(rd("customer"), "c_custkey")
    val orderS = stride(rd("orders"), "o_orderkey")
    val eventS = stride(rd("events"), "event_id")
    val docS = stride(rd("documents"), "doc_id")
    val vecS = stride(rd("embeddings"), "vec_id")

    /** Union of `factor` key-shifted copies; `shift` maps (df, replica). */
    def replicate(n: String, shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = rd(n)
      wr((0 until factor).map(i => shift(base, i)).reduce(_ unionAll _), n)
    }

    replicate("customer", (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custS)))
    replicate("orders", (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderS))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custS)))
    replicate("lineitem", (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderS)))
    replicate("events", (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * eventS))
        .withColumn("user_id", col("user_id") + lit(i * custS)))
    replicate("documents", (df, i) => {
      val txt =
        if (i == 0) col("text")
        else array_join(transform(
          // drop empty tokens BEFORE prefixing: split of an empty or
          // whitespace-only text yields [""], which would otherwise
          // become a bare "r<i>·" token that exists in no source doc —
          // spuriously failing the vocabulary-disjointness assert below
          filter(split(trim(lower(col("text"))), "[ \\t\\n\\x0B\\f\\r]+"),
            t => t =!= ""),
          t => concat(lit(s"r${i}·"), t)), " ")
      df.withColumn("doc_id", col("doc_id") + lit(i * docS))
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    replicate("embeddings", (df, i) => {
      val emb =
        if (i == 0) col("embedding")
        else expr(
          s"""transform(embedding, (x, p) ->
             | CAST(x + (pmod(hash(vec_id, p, $i), 2001) - 1000) * 1.0E-5
             |   AS FLOAT))""".stripMargin)
      df.withColumn("vec_id", col("vec_id") + lit(i * vecS))
        .withColumn("embedding", emb)
    })

    // the linear dedup-pair-scaling claim rests on cross-replica token
    // disjointness — assert it instead of trusting the prefix scheme
    // (a source token starting with "r<digits>·" would silently void it)
    def vocab(df: DataFrame) = df
      .select(explode(split(trim(lower(col("text"))),
        "[ \\t\\n\\x0B\\f\\r]+")).as("tok"))
      .filter(col("tok") =!= "").agg(count_distinct(col("tok"))).as[Long].head()
    val srcVocab = vocab(rd("documents"))
    val outVocab = vocab(spark.read.parquet(s"$out/documents.parquet"))
    require(outVocab == factor.toLong * srcVocab,
      s"cross-replica token collision: $outVocab distinct output tokens, " +
        s"expected $factor × $srcVocab")

    Tables.names.foreach { n =>
      println(s"$n: ${spark.read.parquet(s"$out/$n.parquet").count()} rows")
    }
    if (!preExisting) spark.stop()
  }
}
