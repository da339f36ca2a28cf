package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession builder pre-configured the way every
  * operator in this engine expects to run — at laptop scale or at 1000
  * executors, these are the knobs that matter:
  *
  *  - AQE on (runtime re-planning: join strategy switches, skew splitting,
  *    partition coalescing);
  *  - shuffle partitions sized to the environment, not the 200 default;
  *  - 128 MB scan partitions (spill-aware task sizing for wide parquet);
  *  - UTC session time (deterministic timestamp semantics);
  *  - the engine's native expressions pre-registered.
  */
object Graft {

  def sessionBuilder(master: String = "local[*]",
                     shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
  : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Build (or reuse) the session and register the native functions. */
  def session(master: String = "local[*]"): SparkSession = {
    val s = sessionBuilder(master).getOrCreate()
    functions.GraftFunctions.register(s)
    s
  }
}
