package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.sources.Tables

class TopNPerKeySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  val sf = "/root/testdata/sf0.001"

  test("custom TopNPerKey == window row_number formulation") {
    val df = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val fast = Relational.topNPerGroupFast(df, 5, Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)))
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber").collect().toSeq
    val window = Relational.topNPerGroup(df, 5, col("l_returnflag"),
        col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber").collect().toSeq
    assert(fast == window)
  }

  test("TopNPerKeyExec is planned (strategy injected) with no per-group sort") {
    val df = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val p = Relational.topNPerGroupFast(df, 3, Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)))
      .queryExecution.executedPlan.toString
    assert(p.contains("TopNPerKey"), p)
    assert(!p.contains("Sort ["), p) // heaps, not sort
    assert(p.contains("Exchange hashpartitioning(l_returnflag"), p) // co-located by key
  }

  test("handles n larger than group size and empty input") {
    import spark.implicits._
    val tiny = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val r = Relational.topNPerGroupFast(tiny, 10, Seq("k"), Seq(("v", false)))
      .orderBy("k", "v").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(r == Seq(("a", 1), ("a", 2), ("b", 3)))
    val empty = Relational.topNPerGroupFast(tiny.filter($"v" > 100), 3,
      Seq("k"), Seq(("v", false)))
    assert(empty.count() == 0)
  }
}
