package graft

/** Dev-only: row-count named queries at SPARK_GRAFT_SF_DIR (args = query
  * names) — the scale-regime companion to [[TimeOne]]: at volumes where the
  * DuckDB oracle replay is impractical, the designed-regime contract is a
  * COUNT (e.g. a GenZipf corpus must yield exactly its planted pair count). */
object CountOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"COUNTONE $name rows=${SparkEntry.queries(name)(spark, sfDir).count()}")
      Transients.drop(spark)
    }
    spark.stop()
  }
}
