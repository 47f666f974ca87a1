package graft

import org.apache.spark.sql.SparkSession

/** Gate: execute EVERY SparkEntry query at a given SF through the noop
  * sink (full evaluation of every output column — count() would let
  * Catalyst prune computed projections, the m39 class of data-dependent
  * ANSI error). The correctness gate runs at sf0.01; some errors (zero
  * divisors, overflow) are data-dependent and first appear at sf0.1, so
  * this makes the bench never the first place such an error fires.
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.SmokeAll /root/testdata/sf0.1"
  * Exits 1 if any query throws; per-key failures on stderr.
  */
object SmokeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitionsFor(sfDir, cpus.toInt))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        None
      } catch { case e: Throwable =>
        System.err.println(s"[smoke] FAIL $name: $e")
        Some(name)
      }
    }
    spark.stop()
    println(s"[smoke] ${SparkEntry.queries.size - failures.size}/${SparkEntry.queries.size} pass at $sfDir" +
      (if (failures.nonEmpty) s"; FAILED: ${failures.mkString(",")}" else ""))
    if (failures.nonEmpty) sys.exit(1)
  }
}
