package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the row-vs-columnar delta of the MetricsFeed read path on
  * the q51/q66 shape (filter + groupBy(kind) agg over the synthetic
  * feed) — the evidence SURVEY §6 records for q66. Both modes run the
  * SAME plan semantics; only the reader changes: per-row
  * GenericInternalRow allocation vs 4096-row OnHeapColumnVector batches
  * feeding whole-stage codegen's vectorized loop. min(id) blocks the
  * q58 aggregate-pushdown path so the raw scan does the measured work.
  * Usage: tools/run_main.sh graft.ColumnarDelta [rows]
  */
object ColumnarDelta {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(40000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(columnar: Boolean): Double = {
      val feed = spark.read.format("graft.sources.MetricsFeedSource")
        .option("rows", rows.toString).option("partitions", cpus)
        .option("columnar", columnar.toString).load()
      val t0 = System.nanoTime()
      feed.filter(col("id") >= rows / 4)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
          min(col("id")).as("min_id"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // interleaved min-of-5 per mode, one discarded warm pass each
    once(false); once(true)
    val samples = (1 to 5).map(_ => (once(false), once(true)))
    val row = samples.map(_._1).min
    val colr = samples.map(_._2).min
    println(f"[columnar-delta] rows=$rows row_min=$row%.3f columnar_min=$colr%.3f speedup=${row / colr}%.2fx")
    spark.stop()
  }
}
