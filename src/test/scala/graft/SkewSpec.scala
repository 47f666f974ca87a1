package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plant-and-prove skew handling (r5 verdict ask #4): q21's two skew
  * levers — AQE's runtime skew-join split and the salted two-phase
  * aggregation — each demonstrated against a PLANTED hot key holding
  * 50% of all rows, with the plan marker asserted AND the results
  * proven identical to the unsalted/unsplit formulation. The thresholds
  * are floored in a child session because at spec scale the default
  * 256 MB skew threshold never fires — the MECHANISM is what must
  * scale, exactly like q39's runtime-filter demonstration.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()

  test("AQE splits the planted 50%-hot-key join partition (skew=true in the executed plan)") {
    val s = spark.newSession()
    import s.implicits._
    // builder configs are ignored once a session exists — runtime set
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    // an aggregation ABOVE the join means splitting the skewed
    // partition breaks the join's output partitioning and re-shuffles
    // the agg — OptimizeSkewedJoin declines that trade by default, so
    // the split must be forced. With a partition holding 50% of the
    // shuffle, one straggler task vs one extra (partial-agg'd, tiny)
    // shuffle is the right trade at any scale.
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // 50% of fact rows carry key 0 — one reducer partition holds half
    // the shuffle bytes, the canonical hot-entity shape
    val fact = s.range(200000).select(
      when($"id" % 2 === 0, lit(0L)).otherwise($"id" % 1000).as("k"),
      concat(lit("payload-payload-payload-payload-"), $"id").as("pay"))
    val dim = s.range(1000).select($"id".as("k"), concat(lit("dim"), $"id").as("dname"))
    // the payload must SURVIVE column pruning into the shuffle (an
    // aggregate consumes it) — a key-only shuffle of a constant hot key
    // compresses below any threshold and nothing is skewed to split
    val joined = fact.join(dim, "k")
      .groupBy($"dname").agg(count(lit(1)).as("n"), sum(length($"pay")).as("paylen"))
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    // AQE finalizes the adaptive plan only after execution
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin(skew=true)"), p)
    assert(p.contains("skewed"), p) // AQEShuffleRead … skewed
    // identical results to the broadcast (no-skew-path) formulation
    val expected = fact.join(broadcast(dim), "k")
      .groupBy($"dname").agg(count(lit(1)).as("n"), sum(length($"pay")).as("paylen"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.sameElements(expected))
    assert(got.exists { case (d, n, _) => d == "dim0" && n == 100000L }, "hot key present")
  }

  test("saltedCount shuffles on (key, salt) first — and equals the direct groupBy exactly") {
    val s = spark
    import s.implicits._
    val df = s.range(100000).select(
      when($"id" % 2 === 0, lit("hot")).otherwise(concat(lit("t"), $"id" % 97)).as("event_type"),
      $"id".as("event_id"))
    val salted = graft.operators.Relational
      .saltedCount(df, $"event_type", $"event_id", salts = 16)
    // phase 1 must partition on BOTH the key and the salt — the hot
    // key's rows spread over 16 reducers instead of one
    val p = salted.queryExecution.executedPlan.toString
    val part = p.linesIterator.find(l =>
      l.contains("hashpartitioning") && l.contains("_salt")).getOrElse("")
    assert(part.contains("event_type") || part.contains("key"), p)
    val got = salted.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val direct = df.groupBy($"event_type".as("key")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.sameElements(direct))
    assert(got.exists { case (k, n) => k == "hot" && n == 50000L })
  }
}
