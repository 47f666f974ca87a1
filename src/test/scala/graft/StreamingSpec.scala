package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.HealthStream

/** Stream/batch parity: the production path is readStream over the same
  * aggregation code the batch oracle checks.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  val sf = "/root/testdata/sf0.001"

  test("streaming windowed health == batch windowed health") {
    // file stream source requires a directory: stage the table file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = HealthStream.readEventStream(spark, dir.toString)
    val q = HealthStream.windowedHealth(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("health_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("health_out")
      .orderBy("bucket", "event_type").collect().toSeq
    val batch = HealthStream.windowedHealth(Tables.events(spark, sf))
      .orderBy("bucket", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("stateful sessionization (flatMapGroupsWithState) == declarative sessions") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
      .as[HealthStream.Ev]
    val stateful = HealthStream.sessionsStateful(ev, 30).toDF()
      .select("user_id", "session_idx", "start_us", "end_us", "n_events")
      .orderBy("user_id", "session_idx").collect().toSeq
    val declarative = HealthStream.sessions(Tables.events(spark, sf), 30)
      .select("user_id", "session_idx", "start_us", "end_us", "n_events")
      .orderBy("user_id", "session_idx").collect().toSeq
    assert(stateful == declarative)
  }
}
