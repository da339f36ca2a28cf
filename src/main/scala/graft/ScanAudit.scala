package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
  * `runMain graft.ScanAudit [sfDir] [minCount] [name...]` prints
  * `SCANAUDIT <query> <table>=<n> ...` for every query whose max per-table
  * count >= minCount (default 3). Streaming queries drain on construction;
  * run at sf0.001 where that costs seconds. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minCount = args.lift(1).map(_.toInt).getOrElse(3)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.optimizedPlan
        val tables = scala.collection.mutable.Map.empty[String, Int]
        def tally(p: LogicalPlan): Unit = p.collectWithSubqueries {
          case lr: LogicalRelation =>
            val t = lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.headOption
                  .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
              case _ => "?"
            }
            tables(t) = tables.getOrElse(t, 0) + 1
        }
        tally(plan)
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
