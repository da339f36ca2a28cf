package graft

/** Repeated-run timer for individual registered queries — the evidence tool
  * for plan-vs-plan claims (e.g. native codegen cosine vs the composed
  * higher-order-function form), where single-shot numbers on a shared box
  * are unusable. Prints every run plus the median; full-plan noop-write
  * execution, same as Bench.
  *
  * Usage: runMain graft.MicroBench q40_cosine_topk q53_cosine_topk_native
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPS (default 5).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q40_cosine_topk", "q53_cosine_topk_native")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val times = (1 to reps).map { _ =>
        // same discipline as Bench: a cache-producing query must never
        // report a median of cache hits
        if (Bench.cacheProducers(name)) Bench.evictCaches(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        // release per-query checkpoint residue OUTSIDE the timed span
        // (Bench's discipline): queries that cut a transient would
        // otherwise pin one copy per rep and drift later medians
        Transients.drop(spark)
        elapsed
      }
      val median = times.sorted.apply(reps / 2)
      println(f"$name%-28s median=$median%.3fs runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
