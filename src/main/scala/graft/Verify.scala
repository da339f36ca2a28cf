package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. The per-query
  * loop lives in [[dump]] (session-agnostic) so the EdgeCorpusSpec gate
  * can replay the EXACT driver pipeline — same lints, same clear-before-
  * write hygiene — against adversarial corpora inside `sbt test`. */
object Verify {

  /** Run every registered query against `sfDir`, writing each result to
    * `outDir/<name>` (parquet) and the oracle SQL map to
    * `outDir/oracle_sql.json`. Returns the names of queries that THREW
    * (their output dirs are cleared — a failure must never leave stale
    * parquet for the oracle compare to validate, the r5 blind spot).
    * Does not create or stop the session. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
           only: Option[Set[String]] = None): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    // same long-JVM hygiene as Bench (rationale on Graft.GcNudge): keep
    // the 282-query JVM from compounding eviction pressure into the tail
    val gc = new Graft.GcNudge()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // Clear the query's PREVIOUS output before attempting this run: a
      // failure (including the lint below) must leave NO parquet behind, or
      // the oracle compare validates the stale prior run and reports pass —
      // exactly the r5 blind-spot shape this gate exists to prevent.
      def clear(): Unit = {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
      clear()
      try {
        val df = fn(spark, sfDir)
        // Lint: a DecimalType output column can never pass the driver's
        // hash gate (Spark parquet decimal128 is hashed exactly; the DuckDB
        // oracle side renders float64) — fail loudly instead of shipping a
        // guaranteed mismatch. Cast via Tables.portable at the query site.
        val decs = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
        }
        require(decs.isEmpty,
          s"$name emits DecimalType columns ${decs.mkString(",")} — wrap the final select in Tables.portable")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
        clear() // a partial write must not linger either
      }
      finally {
        Transients.drop(spark) // per-query checkpoint residue
        gc.maybe()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    failed.toSeq
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (dev loop only;
    // the driver always passes two args and gets every query)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the mode — the cluster gate runs this
    // exact main under local-cluster[2,2,1024] (real executor processes)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // one shared config source (AQE, UTC, nanosAsLong, ...): Graft.sessionBuilder
    val spark = Graft.sessionBuilder(master, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dump(spark, sfDir, outDir, only)
    spark.stop()
  }
}
