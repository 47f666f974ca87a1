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
