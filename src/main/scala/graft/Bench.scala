package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the SF the driver points
  * at (SPARK_GRAFT_SF_DIR), prints one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/shuffle machinery spin-up otherwise lands
    // entirely on the alphabetically-first query
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      // a failed query must not shrink the total into a better score:
      // report -1 so the driver (and a human) can see the failure
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // any failure poisons the headline metric — a crashed query must never
    // read as a faster total
    val total = if (results.exists(!_._3)) -1.0
      else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
