package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** m43 mergeable quantile sketch: the two properties that make it a
  * sketch rather than a query — bounded error against the exact
  * quantile, and exact mergeability of partial (per-day) sketches.
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  val sf = "/root/testdata/sf0.001"

  test("m43: estimate is within one 64-cent bin ABOVE the exact quantile, never under") {
    val out = SparkEntry.queries("m43_quantile_sketch")(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val t = r.getString(0)
      val sorted = byType(t)
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      for ((p, i) <- Seq(50 -> 3, 95 -> 4, 99 -> 5)) {
        val est = r.getDouble(i)
        val rank = (n * p + 99) / 100 // ceil(n*p/100), the query's cum*100 >= n*p guard
        val exact = sorted(rank - 1) / 100.0
        assert(est >= exact, s"$t p$p: estimate $est must never undershoot exact $exact")
        assert(est - exact <= 0.64 + 1e-9,
          s"$t p$p: estimate $est exceeds the one-bin error bound over exact $exact")
      }
    }
  }

  test("m43: per-day partial sketches merge to the direct full build (count addition is exact)") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT) div 64").as("bin"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val mergedFromDaily = ev
      .groupBy(col("event_type"), col("day"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("c")).as("c"))
    val direct = ev.groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("c"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val m = asSet(mergedFromDaily)
    assert(m.nonEmpty && m == asSet(direct))
  }

  // m47 — the domain-free (log-binned) sibling. Same fixture metric as
  // the query: cents spread across 24 octaves of per-user unit scale.
  private def m47Metric = graft.sources.Tables.events(spark, sf)
    .select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT) * " +
        "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 24 AS INT))").as("v"))

  test("m47: estimate never undershoots, and relative error is bounded by 1/16 on a 24-octave domain") {
    val out = SparkEntry.queries("m47_log_quantile")(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = m47Metric.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val t = r.getString(0)
      val sorted = byType(t)
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      for ((p, i) <- Seq(50 -> 3, 95 -> 4, 99 -> 5)) {
        val est = r.getLong(i)
        val rank = (n * p + 99) / 100 // ceil(n*p/100) — the cum*100 >= n*p guard
        val exact = sorted(rank - 1)
        assert(est >= exact, s"$t p$p: estimate $est must never undershoot exact $exact")
        // inclusive bin max over a 16-sub-bucket octave: ≤ 1/16 relative
        assert(est <= exact + exact / 16 + 1,
          s"$t p$p: estimate $est exceeds the 1/16 relative bound over exact $exact")
      }
    }
  }

  test("m47: bin count grows with the LOG of the domain — hundreds of bins where the fixed grid needs billions") {
    val out = SparkEntry.queries("m47_log_quantile")(spark, sf).collect()
    val stats = m47Metric.agg(max(col("v")).as("mx")).collect()(0).getLong(0)
    assert(stats > (1L << 26), s"fixture domain must be genuinely wide, got max $stats")
    out.foreach { r =>
      val bins = r.getInt(2)
      // 16 sub-buckets per octave over ≤ 64 octaves of BIGINT domain
      assert(bins > 0 && bins <= 16 * 64, s"${r.getString(0)}: $bins bins")
    }
    // m43's 64-cent grid over the same domain would need max/64 bins
    assert(stats / 64 > 1000000L, "the fixed grid would exceed 1e6 bins here")
  }

  test("m47: bin function properties hold at every octave edge — monotone, ub >= v, ub <= v + v/16") {
    import spark.implicits._
    // exhaustive power-of-two edges across 50 octaves plus in-octave
    // probes: v, its bin, and the bin's inclusive max evaluated by the
    // SAME SQL expressions the query uses
    val edges = (0 until 50).flatMap { k =>
      val base = 1L << k
      Seq(base - 1, base, base + 1, base + base / 2, 2 * base - 1)
    }.filter(v => v >= 0).distinct :+ 0L
    val df = edges.toDF("v")
      .withColumn("qbin", expr("CASE WHEN v < 16 THEN v ELSE 16 * (length(bin(v)) - 1) + " +
        "v div shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 5) - 64 END"))
      .withColumn("ub", expr("CASE WHEN qbin < 16 THEN qbin ELSE " +
        "shiftleft(CAST(17 + qbin % 16 AS BIGINT), CAST(qbin div 16 - 1 AS INT)) - 1 END"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (v, _, ub) =>
      assert(ub >= v, s"ub $ub under v $v")
      assert(ub <= v + v / 16 + 1, s"ub $ub exceeds 1/16 bound for v $v")
    }
    // bins are monotone in v: sorting by v sorts by bin
    val byV = rows.sortBy(_._1)
    byV.sliding(2).foreach {
      case Array((v1, b1, _), (v2, b2, _)) =>
        assert(b1 <= b2, s"bin not monotone: v=$v1 bin=$b1 vs v=$v2 bin=$b2")
      case _ =>
    }
  }

  test("m47: per-day partial log sketches merge to the direct full build") {
    val binned = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT) * " +
          "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 24 AS INT))").as("v"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .select(col("event_type"), col("day"),
        expr("CASE WHEN v < 16 THEN v ELSE 16 * (length(bin(v)) - 1) + " +
          "v div shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 5) - 64 END").as("qbin"))
    val mergedFromDaily = binned
      .groupBy(col("event_type"), col("day"), col("qbin"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"), col("qbin"))
      .agg(sum(col("c")).as("c"))
    val direct = binned.groupBy(col("event_type"), col("qbin"))
      .agg(count(lit(1)).as("c"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val m = asSet(mergedFromDaily)
    assert(m.nonEmpty && m == asSet(direct))
  }
}
