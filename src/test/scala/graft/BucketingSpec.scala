package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Storage-layout levers for 100 TB: bucketing (co-located joins with no
  * exchange on either side) and partition pruning (scan skips
  * partitions entirely). Exercised via real writes to a temp warehouse.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    val s = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", wh.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")) // force non-broadcast
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with zero exchanges") {
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    // co-located: the join itself requires no shuffle of either side
    val joinSection = p.substring(0, p.indexOf("HashAggregate") max 0) // join is below aggs
    assert(p.contains("SortMergeJoin"), p)
    assert("Exchange hashpartitioning\\(l_orderkey".r.findFirstIn(p).isEmpty, p)
    assert("Exchange hashpartitioning\\(o_orderkey".r.findFirstIn(p).isEmpty, p)
    assert(joined.collect().map(_.getAs[Long]("n")).sum == 6000L)
  }

  test("partition pruning skips non-matching partitions at scan time") {
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day")
      .saveAsTable("events_partitioned")
    val q = spark.table("events_partitioned")
      .filter(col("day") === "2024-01-02")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    val n = q.count()
    assert(n > 0 && n < 1000) // one day's slice, not the full table
  }
}
