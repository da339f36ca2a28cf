package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only: per-stage profile of named queries (args = query names).
  * Runs each query once untimed (codegen/JIT warm), then once under a
  * stage listener, and prints every stage of the profiled run sorted by
  * executor-summed task time: duration, task time, GC, shuffle read/write
  * bytes, spill, input bytes, task count. The callsite line in the stage
  * name maps stages back to operators. Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS (same contract as TimeOne). */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer.empty[SparkListenerStageCompleted]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized { stages += sc }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      def once(): Double = {
        if (Bench.cacheProducers(name)) Bench.evictCaches(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val el = (System.nanoTime() - t0) / 1e9
        Transients.drop(spark)
        el
      }
      val warm = once()
      stages.synchronized(stages.clear())
      spark.sparkContext.addSparkListener(listener)
      val timed = try once() finally {
        spark.sparkContext.removeSparkListener(listener)
      }
      println(f"\nPROFILE $name warm=$warm%.2fs profiled=$timed%.2fs")
      val rows = stages.synchronized(stages.toList).map { sc =>
        val si = sc.stageInfo
        val m = si.taskMetrics
        val dur = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        (dur, m.executorRunTime / 1e3, m.jvmGCTime / 1e3,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled, m.inputMetrics.bytesRead, si.numTasks,
          si.stageId, si.name)
      }.sortBy(-_._2)
      println(f"${"wall_s"}%7s ${"task_s"}%8s ${"gc_s"}%6s ${"shRead"}%10s " +
        f"${"shWrite"}%10s ${"spill"}%9s ${"input"}%10s ${"tasks"}%6s  stage")
      rows.foreach { case (d, rt, gc, sr, sw, sp, in, nt, id, nm) =>
        println(f"$d%7.2f $rt%8.2f $gc%6.2f $sr%10d $sw%10d $sp%9d $in%10d $nt%6d  [$id] ${nm.take(90)}")
      }
      val totTask = rows.map(_._2).sum
      println(f"stages=${rows.size} total_task_s=$totTask%.1f")
    }
    spark.stop()
  }
}
