package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the sequential-fold operators (st14 cooldown,
  * m48 EWMA): the Spark aggregate() HOF result must equal a plain Scala
  * reference fold on random event sequences, and the fold invariants
  * must hold. This pins the HOF expression itself (lambda scoping,
  * struct accumulator field order, init-sentinel handling) — the class
  * of bug DuckDB 1.0's list_reduce exhibits (CLAUDE.md round-7
  * findings), proven absent here.
  */
class FoldPropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  private val rng = new scala.util.Random(7)
  private val cooldownUs = 600000000L
  private val sentinel = -4611686018427387904L

  private def randSeq(n: Int): Seq[(Long, Long)] = {
    // strictly increasing ts with gaps straddling the cooldown boundary
    var t = 1000000000000000L
    (1 to n).map { i =>
      t += (rng.nextInt(3) match {
        case 0 => rng.nextInt(1000) + 1L             // far inside cooldown
        case 1 => cooldownUs + rng.nextInt(1000) - 500L // at the boundary
        case 2 => cooldownUs * 2 + rng.nextInt(1000)  // far outside
      })
      (t, i.toLong)
    }
  }

  private def refCooldown(ts: Seq[Long]): (Long, Long) = {
    var last = sentinel; var n = 0L
    ts.foreach { t => if (t - last >= cooldownUs) { last = t; n += 1 } }
    (n, last)
  }

  test("st14 cooldown fold == reference Scala fold on 50 random sequences; invariants hold") {
    import spark.implicits._
    val cases = (1 to 50).map(i => (i.toLong, randSeq(rng.nextInt(40) + 1)))
    val df = cases.flatMap { case (u, s) => s.map { case (t, e) => (u, t, e) } }
      .toDF("user_id", "ts_us", "event_id")
    val got = df.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct($"ts_us", $"event_id"))).as("seq"))
      .withColumn("acc", expr(
        s"aggregate(seq, named_struct('last', CAST($sentinel AS BIGINT), " +
        "'n', CAST(0 AS BIGINT)), (acc, x) -> " +
        s"IF(x.ts_us - acc.last >= $cooldownUs, " +
        "named_struct('last', x.ts_us, 'n', acc.n + 1), acc))"))
      .select($"user_id", $"n_events", $"acc.n", $"acc.last")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    cases.foreach { case (u, s) =>
      val (nA, last) = refCooldown(s.map(_._1))
      val (nEv, gotN, gotLast) = got(u)
      assert(nEv == s.size && gotN == nA && gotLast == last,
        s"user $u: got ($nEv,$gotN,$gotLast) want (${s.size},$nA,$last)")
      assert(gotN >= 1 && gotN <= s.size, "first event always alerts; never more than events")
    }
    // spacing invariant on one dense sequence: consecutive ALERTS are
    // >= cooldown apart even when events are not
    val dense = (1 to 200).map(i => 1000000000000000L + i * 7000000L) // 7s apart
    var last = sentinel; val alerts = scala.collection.mutable.ArrayBuffer[Long]()
    dense.foreach { t => if (t - last >= cooldownUs) { last = t; alerts += t } }
    assert(alerts.sliding(2).forall(p => p.size < 2 || p(1) - p(0) >= cooldownUs))
  }

  test("m48 EWMA fold == reference Scala fold; result bounded by [min, max] of the inputs") {
    import spark.implicits._
    val cases = (1 to 50).map { i =>
      (i.toLong, (1 to rng.nextInt(60) + 1).map { j =>
        (1000000000000000L + j * 1000000L, j.toLong, rng.nextInt(20001) - 10000L)
      })
    }
    val df = cases.flatMap { case (u, s) => s.map { case (t, e, c) => (u, t, e, c) } }
      .toDF("user_id", "ts_us", "event_id", "c")
    val got = df.groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"ts_us", $"event_id", $"c"))).as("seq"))
      .withColumn("ewma_c", expr(
        s"aggregate(seq, CAST($sentinel AS BIGINT), (acc, x) -> " +
        s"IF(acc = $sentinel, x.c, (acc + x.c) div 2))"))
      .select($"user_id", $"ewma_c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (u, s) =>
      val cs = s.map(_._3)
      val want = cs.tail.foldLeft(cs.head) { (acc, c) =>
        // Spark div truncates toward zero — match exactly on negatives
        val sum = acc + c
        sum / 2 // JVM Long division truncates toward zero, same as div
      }
      assert(got(u) == want, s"user $u: got ${got(u)} want $want")
      assert(got(u) >= cs.min - 1 && got(u) <= cs.max + 1,
        s"EWMA must stay within (toward-zero-truncation-widened) input bounds")
    }
  }
}
