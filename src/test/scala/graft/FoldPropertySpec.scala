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
  private val sentinel = graft.streaming.HealthStream.CooldownSentinelUs

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

  test("m51 CUSUM fold == reference Scala fold on 50 bursty sequences; planted bursts ALARM") {
    import spark.implicits._
    // sequences mix a quiet baseline with planted bursts so the alarm
    // branch (cross h → record + reset) actually executes — the real
    // corpus is uniform and never alarms, which would leave that branch
    // untested
    val cases = (1 to 50).map { u =>
      val thr = 3L; val h = 9L
      val xs = (1 to rng.nextInt(60) + 10).map { j =>
        if (rng.nextInt(8) == 0) rng.nextInt(20) + 10L else rng.nextInt(4).toLong
      }
      (u.toLong, thr, h, xs)
    }
    def refCusum(xs: Seq[Long], thr: Long, h: Long): (Long, Long, Long) = {
      var s = 0L; var alarms = 0L; var first = -1L; var maxs = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        val s2 = math.max(0L, s + x - thr)
        maxs = math.max(maxs, s2)
        if (s2 > h) { alarms += 1; if (first < 0) first = i + 1L; s = 0L }
        else s = s2
      }
      (alarms, first, maxs)
    }
    val df = cases.flatMap { case (u, _, _, xs) =>
      xs.zipWithIndex.map { case (x, i) => (u, i + 1L, x) } }
      .toDF("user_id", "bucket", "cnt")
    val s2 = "greatest(CAST(0 AS BIGINT), acc.s + x.cnt - 3)"
    val got = df.groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"bucket", $"cnt"))).as("seq"))
      .withColumn("acc", expr(
        s"""aggregate(seq,
           |  struct(CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS alarms,
           |         CAST(-1 AS BIGINT) AS first_b, CAST(0 AS BIGINT) AS maxs),
           |  (acc, x) -> struct(
           |    CASE WHEN $s2 > 9 THEN CAST(0 AS BIGINT) ELSE $s2 END AS s,
           |    acc.alarms + CASE WHEN $s2 > 9 THEN 1 ELSE 0 END AS alarms,
           |    CASE WHEN acc.first_b < 0 AND $s2 > 9 THEN x.bucket
           |         ELSE acc.first_b END AS first_b,
           |    greatest(acc.maxs, $s2) AS maxs))""".stripMargin))
      .select($"user_id", $"acc.alarms", $"acc.first_b", $"acc.maxs")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    var anyAlarm = false
    cases.foreach { case (u, thr, h, xs) =>
      val want = refCusum(xs, thr, h)
      assert(got(u) == want, s"user $u: got ${got(u)} want $want")
      if (want._1 > 0) anyAlarm = true
    }
    assert(anyAlarm, "fixture must fire at least one alarm or the alarm branch is untested")
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
