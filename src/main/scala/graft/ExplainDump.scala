package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Write `.explain("formatted")` for the named keys to files — the
  * plans/r15 before/after evidence the optimization rounds commit.
  * Usage:
  *   tools/run_main.sh graft.ExplainDump <outDir> <suffix> key1 key2 ...
  * writes <outDir>/<key>_<suffix>.txt for each key (suffix = before|after).
  * Dir defaults to sf0.01 (plan SHAPE is SF-independent; keys whose
  * builders run eager sub-jobs stay cheap there). SPARK_GRAFT_EXPLAIN_SF
  * overrides the data dir.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SF", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitionsFor(dir, cpus.toInt))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try w.println(txt) finally w.close()
      println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
