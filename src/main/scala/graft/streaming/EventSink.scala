package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.sources.LogLines

/** The reference's upload surface (chStats.py:481-483 `send_payload`:
  * serialized events to a syslog socket) as a streaming sink.
  *
  * Production target is any per-batch writer (JDBC/ClickHouse, socket,
  * Kafka); `foreachBatch` gives exactly-once-per-batch semantics with
  * the batch id for idempotent retries. Here the writer lands
  * PH_SYSTEM-formatted lines as text files — swap `writeBatch` for a
  * real transport without touching the pipeline.
  */
object EventSink {

  /** Serialize health rows to PH_SYSTEM payload lines. */
  def toPayloads(health: DataFrame): DataFrame =
    health.select(LogLines.phPayload("DATA_NODE_HEALTH",
      "eventType" -> LogLines.jstr(col("event_type")),
      "n" -> col("n").cast("string"),
      "queueSize" -> col("n_errors").cast("string"),
      "bucket" -> LogLines.jstr(col("bucket").cast("string"))
    ).as("value"))

  /** Health rows as (k, payload) pairs for keyed sinks (JdbcSink): the
    * key is the natural identity of the health record. */
  def toKeyedPayloads(health: DataFrame): DataFrame =
    health.select(
      concat_ws("|", col("event_type"), col("bucket").cast("string")).as("k"),
      LogLines.phPayload("DATA_NODE_HEALTH",
        "eventType" -> LogLines.jstr(col("event_type")),
        "n" -> col("n").cast("string"),
        "queueSize" -> col("n_errors").cast("string"),
        "bucket" -> LogLines.jstr(col("bucket").cast("string"))
      ).as("payload"))

  /** Start the continuous upload job: windowed health → payload lines →
    * per-batch append to `outDir`. */
  def start(health: DataFrame, outDir: String, checkpoint: String,
      mode: String = "append"): StreamingQuery =
    toPayloads(health)
      .writeStream
      .outputMode(mode)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        batch.write.mode("append").text(s"$outDir/batch_$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
