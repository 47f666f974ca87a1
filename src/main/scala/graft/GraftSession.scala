package graft

import org.apache.spark.sql.SparkSession

/** Central session configuration for the graft engine.
  *
  * Scale posture: AQE on (runtime partition coalescing + skew-join
  * splitting), UTC session time, and no hard-coded partition counts in any
  * operator — parallelism comes from the cluster config, so the same code
  * runs on local[32] and a 1000-executor cluster.
  */
object GraftSession {

  /** Apply graft's standard config to a builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.adaptive.enabled", "true")
    // static conf, default 100: a 90+-query workload cycling through the
    // whole-stage-codegen cache re-Janino-compiles every plan on every
    // revisit (~1.5× uniform slowdown measured on the interleaved bench)
    .config("spark.sql.codegen.cache.maxEntries", "5000")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // events.parquet has shipped as TIMESTAMP(NANOS) (older generators) and
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) (current). Keep nanosAsLong
    // so a NANOS column arrives as Long; Tables.events normalizes either
    // form to µs TimestampType.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    // write µs (not INT96) so emitted timestamps match DuckDB's TIMESTAMP
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  /** Local session for tests / tools. */
  def local(cores: String = "4", shufflePartitions: Int = 8): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
