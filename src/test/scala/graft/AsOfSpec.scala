package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()

  test("asofPrior picks the latest strictly-prior left event per key") {
    import spark.implicits._
    // key 1: purchases at t=10,20; errors at t=15,25 → priors 10, 20
    // key 2: error at t=5 with no prior purchase → dropped
    val ev = Seq(
      (1L, 100L, 10L, "purchase"), (1L, 101L, 20L, "purchase"),
      (1L, 102L, 15L, "error"), (1L, 103L, 25L, "error"),
      (2L, 200L, 5L, "error")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val r = AsOf.asofPrior(ev, "user_id", "event_id", "ts_us",
        isLeft = col("event_type") === "purchase",
        isRight = col("event_type") === "error")
      .orderBy("event_id").collect()
    assert(r.map(_.getAs[Long]("event_id")).toSeq == Seq(102L, 103L))
    assert(r.map(_.getAs[Long]("prior_id")).toSeq == Seq(100L, 101L))
    assert(r.map(_.getAs[Long]("gap_us")).toSeq == Seq(5L, 5L))
  }

  test("longestStreak finds maximal consecutive runs") {
    import spark.implicits._
    // key 1 sequence: E E P E E E P → streaks 2 and 3 → max 3, n=2
    val ev = (1 to 7).map { i =>
      val t = Seq("error", "error", "purchase", "error", "error", "error", "purchase")(i - 1)
      (1L, i.toLong, i.toLong * 10, t)
    }.toDF("user_id", "event_id", "ts_us", "event_type")
    val r = AsOf.longestStreak(ev, "user_id", "event_id", "ts_us",
      col("event_type") === "error").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("max_streak") == 3L)
    assert(r(0).getAs[Long]("n_streaks") == 2L)
  }
}
