package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
