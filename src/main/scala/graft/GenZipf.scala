package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse-regime documents corpus generator (round-7 VERDICT item 6): the
  * graded corpus has a ~40-word vocabulary, so near-dup LSH selectivity
  * never runs in its DESIGNED regime there (every bucket is dense). This
  * writes a `documents.parquet` with a Zipf-ish `vocab`-token vocabulary —
  * the DedupSimilaritySpec sparse fixture, promoted to an arbitrary-volume
  * generator — so q36/q38/q140 pair mass in the sparse regime is a
  * MEASURED number at sf0.1-equivalent volume, not a 420-doc spec-sized
  * one.
  *
  * `runMain graft.GenZipf <outDir> [nDocs=5000] [vocab=5000]`
  *
  * Corpus law, all draws deterministic xxhash64 (no Random, no timestamps —
  * rerunning regenerates byte-identical parquet):
  *  - base docs 0..nDocs-1: 60 tokens each, token rank = ⌊u³·vocab⌋ for a
  *    uniform hash draw u (cubing piles mass on low ranks — Zipf-ish);
  *  - planted twins: 5% of docs (ids nDocs+j twin doc 20j) with 3 of the
  *    60 token positions re-drawn — token-set Jaccard ≈ 0.9, the q36
  *    banding design point — regenerated from the base doc's SEED, so no
  *    self-join is needed to build them;
  *  - lang/source/n_chars match the graded schema, so every documents
  *    query runs unchanged against the output dir.
  */
object GenZipf {

  /** 60 Zipf-drawn tokens as a SQL expression over a long id column —
    * a pure function of (id, position), shared by base docs and twins. */
  private def tokSql(idCol: String, p: String): String =
    s"""concat('w', CAST(pow(pmod(xxhash64('zipf', $idCol, $p), 1000000)
       |  / 1000000.0D, 3.0D) * @V AS INT))""".stripMargin

  def corpus(spark: SparkSession, nDocs: Long, vocab: Int): DataFrame = {
    val nTwins = nDocs / 20
    val base = spark.range(nDocs).select(
      col("id").as("doc_id"),
      expr(
        s"""array_join(transform(sequence(0, 59),
           |  p -> ${tokSql("id", "p")}), ' ')""".stripMargin
          .replace("@V", vocab.toString)).as("text"))
    // twin j re-derives base doc 20j's tokens from the SAME hash seed and
    // re-draws 3 deterministic positions with a salted draw
    val twins = spark.range(nTwins).select(
      (col("id") + nDocs).as("doc_id"),
      expr(
        s"""array_join(transform(sequence(0, 59),
           |  p -> CASE WHEN p IN (
           |      pmod(xxhash64('pos1', id), 60),
           |      pmod(xxhash64('pos2', id), 60),
           |      pmod(xxhash64('pos3', id), 60))
           |    THEN concat('w', CAST(pow(
           |      pmod(xxhash64('twin', id, p), 1000000) / 1000000.0D, 3.0D)
           |      * @V AS INT))
           |    ELSE ${tokSql("(id * 20)", "p")} END), ' ')""".stripMargin
          .replace("@V", vocab.toString)).as("text"))
    base.unionAll(twins)
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("zipf"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(5000L)
    val vocab = args.lift(2).map(_.toInt).getOrElse(5000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val preExisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GenScale.writeSingleFile(corpus(spark, nDocs, vocab), out, "documents")
    println(s"documents: ${spark.read.parquet(s"$out/documents.parquet").count()} rows")
    if (!preExisting) spark.stop()
  }
}
