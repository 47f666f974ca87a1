package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Benchmark harness. Per query: one discarded warm run (codegen compile,
  * file listing, broadcast build), then SPARK_GRAFT_BENCH_N measured runs
  * (default 3); the reported number is the per-query MEDIAN, so a single
  * contended run can't distort the suite total. The JSON result is printed
  * as the final stdout line AFTER spark.stop() so no executor/log output
  * can trail or interleave with it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/codegen warmup so the first measured queries don't absorb JVM
    // startup (hash agg, shuffle, md5/regex/string/window codepaths).
    spark.range(2000000)
      .selectExpr("id", "md5(cast(id as string)) as m")
      .selectExpr("id", "m", "regexp_replace(upper(m), '[0-9]+', ' ') as r")
      .selectExpr("id", "m", "r", "explode(split(trim(r), '\\\\s+')) as t")
      .groupBy(expr("substr(m, 1, 2)"))
      .agg(expr("count(distinct t)"), expr("sum(length(r))"))
      .count()
    spark.range(1000000).selectExpr("id % 97 as k", "id as v")
      .selectExpr("k", "v", "row_number() over (partition by k order by v desc) as rn")
      .filter(expr("rn <= 3"))
      .write.mode("overwrite").format("noop").save()
    // noop sink: full evaluation of every output column, no pruning
    // shortcut (count() would let Catalyst skip computed columns), no
    // disk write in the measurement.
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        runOnce(fn) // warm run: plan + codegen + page cache; discarded
        val samples = Seq.fill(iters)(runOnce(fn)).sorted
        samples(samples.length / 2) // median
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name: $e"); -1.0
      }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$iters}"""
    spark.stop()
    // sole trailing stdout line — the driver parses the output tail
    System.out.println(line)
    System.out.flush()
  }
}
