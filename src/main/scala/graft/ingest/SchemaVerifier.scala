package graft.ingest

import org.apache.spark.sql.DataFrame
import org.slf4j.LoggerFactory

/** Advisory schema verification — the Spark rebuild of the reference's
  * `column_verifier` (/root/reference/src/main.rs:82-128).
  *
  * Contract preserved exactly:
  *  - presence-of-names only (never dtypes, order, nullability);
  *  - each missing expected column is WARN-logged (main.rs:113-118);
  *  - each unexpected extra column is INFO-logged (main.rs:120-124);
  *  - advisory: never fails the run (hard failure happens later at
  *    projection time, as in the reference — main.rs:148).
  *
  * Improvement over the reference: this reads `df.schema` — plan metadata,
  * free after `spark.read` — instead of re-scanning the whole file
  * (the reference's first of two full CSV reads, main.rs:83-87).
  */
object SchemaVerifier {
  private val log = LoggerFactory.getLogger(getClass)

  final case class Report(missing: Seq[String], unexpected: Seq[String]) {
    def ok: Boolean = missing.isEmpty
  }

  def verify(df: DataFrame, expected: Seq[String] = AirQualitySchema.expectedColumns): Report = {
    val present = df.columns.toSet
    val expectedSet = expected.toSet
    val missing = expected.filterNot(present)
    val unexpected = df.columns.toSeq.filterNot(expectedSet)
    missing.foreach(c => log.warn(s"Column not found in the dataframe: $c"))
    unexpected.foreach(c => log.info(s"Unexpected column present: $c"))
    if (missing.isEmpty) log.info("All expected columns are present")
    Report(missing, unexpected)
  }
}
