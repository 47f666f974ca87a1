package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001 and return rows; spot-check
  * known invariants. The DuckDB oracle parity is exercised by
  * tools/check_correctness.py (driver gate replica).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  val sf = "/root/testdata/sf0.001"

  test("every declared query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("driver smoke: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle entry") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("Observation metrics ride the job — no second pass, values match a direct agg") {
    import org.apache.spark.sql.functions._
    // the production telemetry hook: a 100-TB ingest accounts rows /
    // nulls / value mass DURING the job via observe(), instead of
    // re-scanning the corpus for a metrics pass. Values must equal a
    // direct aggregation of the same input.
    val obs = new org.apache.spark.sql.Observation("ingest_metrics")
    val ev = graft.sources.Tables.events(spark, sf)
    val out = ev.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_users"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    out.collect() // one job; metrics observed on the side
    val m = obs.get
    val direct = ev.agg(count(lit(1)),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)),
      sum(round(col("value") * 100).cast("long"))).head()
    assert(m("n_rows") == direct.getLong(0))
    assert(m("n_null_users") == direct.getLong(1))
    assert(m("value_cents") == direct.getLong(2))
  }

  test("q1 aggregates are internally consistent") {
    val r = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(r.length == 6) // 3 returnflags x 2 linestatus
    r.foreach { row =>
      val sumQty = row.getAs[Double]("sum_qty")
      val avgQty = row.getAs[Double]("avg_qty")
      val n = row.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-9)
    }
  }

  test("q7 top-k is sorted descending") {
    val prices = SparkEntry.queries("q7_topk_orders")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }
}
