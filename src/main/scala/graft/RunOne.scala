package graft

import org.apache.spark.sql.SparkSession

/** Debug harness: execute ONE query key against a testdata dir, forcing
  * FULL evaluation through the noop sink — count() would let Catalyst
  * prune computed columns (the m39 class of data-dependent ANSI error
  * lives in the final projection and count() never evaluates it). Usage:
  *   sbt "runMain graft.RunOne m39_seasonal_baseline /root/testdata/sf0.1"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitionsFor(dir, cpus.toInt))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // timer starts BEFORE construction: eager work inside the query
    // builder (localCheckpoint'ed subplans) must not escape the
    // measurement (Bench.runOnce already times fn + sink together)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      println(df.queryExecution.executedPlan.toString)
    println(f"[runone] $name rows=${df.count()} noop_sec=$sec%.3f")
    spark.stop()
  }
}
