package graft

/** Dev-only: time named queries at SPARK_GRAFT_SF_DIR (args = query names). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        if (Bench.cacheProducers(name)) Bench.evictCaches(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        Transients.drop(spark)
        elapsed
      }
      println(f"TIMEONE $name median=${ts.sorted.apply(1)}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
