package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Dev-only plan audit: how many times does each query's OPTIMIZED plan
  * scan each base parquet table? A table scanned 3+ times usually means a
  * multi-consumer frame missing its [[Transients.cut]] — each consumer
  * re-reads the corpus and re-evaluates every projection under it (the
  * q237/q118 projection-collapse fanout this tool was built to hunt).
  * Cached/cut subtrees (InMemoryRelation, LogicalRDD) count as ZERO scans
  * by construction: they are leaves of the optimized plan, so their
  * one-time lineage never inflates the count the way raw `explain` text
  * does. Subquery expressions (EXISTS/IN/scalar) are included.
  *
  * `runMain graft.ScanAudit [sfDir] [minCount|name...] [name...]` prints
  * `SCANAUDIT <query> <table>=<n> ...` for every query whose max per-table
  * count >= minCount (default 3); a non-numeric second arg is taken as a
  * query name. Streaming queries drain on construction; run at sf0.001
  * where that costs seconds.
  *
  * [[ScanAuditSpec]] pins every query's counts as a disposition list, so
  * a projection-collapse regression (the q237/q118 class, found only via
  * a bench diff in round 11) fails `sbt test` instead of a bench cycle. */
object ScanAudit {

  /** One query's per-base-table scan tally over the OPTIMIZED plan
    * (subqueries included; cut/cached subtrees are leaves and count 0).
    * Shared by the CLI below and the ScanAuditSpec gate. */
  def scanCounts(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
    val tables = scala.collection.mutable.Map.empty[String, Int]
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case lr: LogicalRelation =>
        val t = lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
          case _ => "?"
        }
        tables(t) = tables.getOrElse(t, 0) + 1
    }
    tables.toMap
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // a non-numeric second arg is a QUERY NAME, not a broken minCount —
    // `ScanAudit <dir> q237_...` must work without forcing a dummy count
    val minCount = args.lift(1)
      .flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(3)
    val numericSecond = args.lift(1)
      .exists(a => scala.util.Try(a.toInt).isSuccess)
    val nameArgs = if (numericSecond) args.drop(2) else args.drop(1)
    val names =
      if (nameArgs.nonEmpty) nameArgs.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val tables = scanCounts(SparkEntry.queries(n)(spark, sfDir))
        if (tables.nonEmpty && tables.values.max >= minCount) {
          val s = tables.toSeq.sortBy(-_._2)
            .map { case (t, c) => s"$t=$c" }.mkString(" ")
          println(s"SCANAUDIT $n $s")
        }
      } catch {
        case e: Throwable =>
          println(s"SCANAUDIT $n ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally Transients.drop(spark)
    }
    println("SCANAUDIT done")
    spark.stop()
  }
}
