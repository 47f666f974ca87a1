package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Monitoring
import graft.sources.{LogLines, Tables}

class MonitoringSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  val sf = "/root/testdata/sf0.001"

  test("nested health docs serialize to real JSON and flatten back losslessly") {
    import spark.implicits._
    // Inside one plan Catalyst (OptimizeJsonExprs) elides the redundant
    // from_json(to_json(...)) — correct, and free performance. To prove
    // the SERIALIZED form is lossless (the cross-system contract), break
    // lineage: materialize the JSON strings, rehydrate a fresh Dataset,
    // and flatten that — from_json must now parse real bytes.
    val ev = Tables.events(spark, sf)
    val docStrings = Monitoring.nestedHealthDoc(ev)
      .select($"doc").as[String].collect().toSeq
    assert(docStrings.nonEmpty && docStrings.forall(_.startsWith("{\"shard\":")))
    val flatFromBytes = Monitoring.flattenHealthDoc(
        spark.createDataset(docStrings).toDF("doc"))
      .orderBy("shard", "device_name", "db_table").collect().toSeq
    val fused = Monitoring.flattenHealthDoc(Monitoring.nestedHealthDoc(ev))
      .orderBy("shard", "device_name", "db_table").collect().toSeq
    assert(flatFromBytes == fused)
  }

  test("health_pct is int(active/total*100) like the reference") {
    val r = Monitoring.healthSnapshot(Tables.events(spark, sf)).collect()
    r.foreach { row =>
      val total = row.getAs[Long]("n_total")
      val err = row.getAs[Long]("n_error")
      assert(row.getAs[Int]("health_pct") == ((total - err) * 100 / total).toInt)
      assert(err <= total)
    }
  }

  test("replication lag: freshest node has zero lag, all lags non-negative") {
    val r = Monitoring.replicationLag(Tables.events(spark, sf)).collect()
    val lags = r.map(_.getAs[Long]("lag_us"))
    assert(lags.min == 0L)
    assert(lags.forall(_ >= 0L))
  }

  test("kv parsing round-trips typed values with key normalization") {
    import spark.implicits._
    val df = Seq("Zookeeper version: 3.7\nMode: leader\nNode count: 4").toDF("text")
    val m = LogLines.normalizeKeys(LogLines.kvMap(col("text"), ": "))
    val row = df.select(
      LogLines.getString(m, "mode").as("mode"),
      LogLines.getLong(m, "node_count").as("n")).head()
    assert(row.getString(0) == "leader" && row.getLong(1) == 4L)
  }

  test("phPayload serializes the reference's syslog format") {
    import spark.implicits._
    val out = Seq((7, 2)).toDF("id", "qs")
      .select(LogLines.phPayload("DATA_NODE_HEALTH",
        "deviceName" -> LogLines.jstr(concat(lit("node-"), col("id"))),
        "queueSize" -> col("qs").cast("string")).as("p"))
      .head().getString(0)
    assert(out == """PH_SYSTEM_DATA_NODE_HEALTH={"deviceName":"node-7","queueSize":2}""")
  }

  test("count-min estimate is one-sided: cms_n >= true_n for every key") {
    val rows = SparkEntry.queries("m32_cms_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("true_n"), r.toString)
    }
  }

  test("timeBucket floors to epoch-aligned intervals") {
    import spark.implicits._
    val df = Seq("2024-03-01 10:07:59").toDF("s")
      .select(Monitoring.timeBucket(col("s").cast("timestamp"), 5).cast("string").as("b"))
    assert(df.head().getString(0) == "2024-03-01 10:05:00")
  }

  test("m52: SCD2 history is a well-formed interval chain per user") {
    val rows = SparkEntry.queries("m52_scd2_history")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[String]("state"), r.getAs[Long]("valid_from_us"),
        Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.longValue),
        r.getAs[Boolean]("is_current")))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (uid, vs0) =>
      val vs = vs0.sortBy(_._2)
      // versions dense 1..n; exactly one open (current) interval
      assert(vs.map(_._2).toSeq == (1 to vs.length), s"user $uid versions not dense")
      assert(vs.count(_._6) == 1, s"user $uid must have exactly one current row")
      assert(vs.last._6 && vs.last._5.isEmpty, s"user $uid current row must be last")
      vs.sliding(2).foreach {
        case Array(a, b) =>
          // intervals chain with no gap and no overlap...
          assert(a._5.contains(b._4), s"user $uid intervals must chain")
          // ...and a version row only opens on an actual state CHANGE
          assert(a._3 != b._3, s"user $uid consecutive versions share a state")
        case _ => ()
      }
    }
  }
}
