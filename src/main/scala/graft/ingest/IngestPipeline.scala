package graft.ingest

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.slf4j.LoggerFactory

/** The end-to-end parity pipeline — Spark rebuild of the reference's `main`
  * (/root/reference/src/main.rs:27-80):
  *
  *   (cold) fetch zip -> extract CSV -> | (warm: CSV already local, skip)
  *   read CSV (header + inferSchema)    | main.rs:36-42 short-circuit
  *   -> advisory schema verification (O4)
  *   -> 8-column projection (O5; missing column => AnalysisException, the
  *      same fail-hard contract as PolarsError::ColumnNotFound, surfaced at
  *      analysis time instead of execution time)
  *   -> single-file Parquet (O6; coalesce(1) reproduces the reference's
  *      one-file ParquetWriter output, main.rs:41-42)
  *
  * Differences by design (SURVEY.md §4.1 anti-optimizations, not copied):
  *  - ONE scan, not two: verification reads plan metadata, and Catalyst's
  *    ColumnPruning pushes the projection into the CSV reader;
  *  - no fsync-per-chunk download loop: the source path is any Hadoop-FS URI
  *    (file:/, s3a://) read by the framework.
  */
object IngestPipeline {
  private val log = LoggerFactory.getLogger(getClass)

  /** Config object — the reference's env contract (main.rs:32-48) with the
    * DESTINATION/zip-path coupling made explicit (one setting, SURVEY.md O8).
    */
  final case class Config(
      csvPath: String,          // UNZIPPED_DATA_1: extracted CSV (warm-path key)
      zipPath: Option[String],  // DESTINATION: local zip to extract on cold path
      outputPath: String)       // parquet sink (reference: data/datafile.parquet)

  object Config {
    def fromEnv(env: Map[String, String] = sys.env): Config = Config(
      csvPath = env.getOrElse("UNZIPPED_DATA_1",
        throw new IllegalArgumentException("UNZIPPED_DATA_1 is required")),
      zipPath = env.get("DESTINATION"),
      outputPath = env.getOrElse("OUTPUT_PATH", "data/datafile.parquet"))
  }

  /** Warm/cold short-circuit (O7, main.rs:36): extract only if the CSV is
    * not already present. */
  def ensureCsv(conf: Config): Unit =
    if (Files.exists(Paths.get(conf.csvPath))) {
      log.info("File already exists so skipping the data gathering")
    } else conf.zipPath match {
      case Some(zip) =>
        // a bare relative filename has no parent -> extract into the cwd
        val outDir = Option(Paths.get(conf.csvPath).getParent)
          .getOrElse(Paths.get("."))
        ZipExtract.toLocal(zip, outDir.toString)
      case None =>
        throw new IllegalArgumentException(
          s"${conf.csvPath} absent and no zip path configured")
    }

  /** Read once; inference faithful to the reference's CsvReadOptions
    * defaults (main.rs:83-87). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** The O5 projection. Missing column -> AnalysisException (fail-hard).
    * Names are backtick-quoted: `PM2.5` would otherwise parse as a struct
    * field access. */
  def project(df: DataFrame): DataFrame =
    df.select(AirQualitySchema.projectedColumns
      .map(c => org.apache.spark.sql.functions.col(s"`$c`")): _*)

  /** Full pipeline; returns the projected frame after writing it. */
  def run(spark: SparkSession, conf: Config): DataFrame = {
    ensureCsv(conf)
    val df = readCsv(spark, conf.csvPath)
    SchemaVerifier.verify(df) // advisory only, as in the reference
    val projected = project(df)
    projected.coalesce(1).write.mode("overwrite").parquet(conf.outputPath)
    projected
  }
}
