package graft.streaming

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ClickHouse-shaped JDBC sink for the reference's upload surface
  * (chStats.py:481-483 send_payload; the north star is Structured
  * Streaming + a ClickHouse sink).
  *
  * Shape at cluster scale: each micro-batch is written idempotently —
  * DELETE the batch's rows, then batched `PreparedStatement` INSERTs,
  * one connection per partition (opened executor-side, never on the
  * driver), `addBatch`/`executeBatch` every `insertBatchSize` rows. A
  * retried batchId therefore replays to the same final state — the
  * standard foreachBatch exactly-once recipe over an at-least-once
  * engine. Swapping the embedded-Derby test-double URL for a ClickHouse
  * JDBC URL changes no writer code.
  */
object JdbcSink {

  private def withConn[A](url: String)(f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** Create the payload table if absent (Derby has no IF NOT EXISTS;
    * SQLState X0Y32 = object already exists). */
  def ensureTable(url: String, table: String): Unit = withConn(url) { c =>
    val st = c.createStatement()
    try st.executeUpdate(s"CREATE TABLE $table (batch_id BIGINT NOT NULL, " +
      "k VARCHAR(256) NOT NULL, payload VARCHAR(4000) NOT NULL)")
    catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
    finally st.close()
  }

  /** Idempotent write of one micro-batch of (k, payload) rows. */
  def writeBatch(batch: DataFrame, batchId: Long, url: String, table: String,
      insertBatchSize: Int = 500): Unit = {
    withConn(url) { c =>
      val del = c.prepareStatement(s"DELETE FROM $table WHERE batch_id = ?")
      try { del.setLong(1, batchId); del.executeUpdate() } finally del.close()
    }
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) withConn(url) { c =>
        c.setAutoCommit(false)
        val ins = c.prepareStatement(
          s"INSERT INTO $table (batch_id, k, payload) VALUES (?, ?, ?)")
        try {
          var n = 0
          rows.foreach { r =>
            ins.setLong(1, batchId)
            ins.setString(2, r.getString(0))
            ins.setString(3, r.getString(1))
            ins.addBatch()
            n += 1
            if (n % insertBatchSize == 0) { ins.executeBatch(); c.commit() }
          }
          ins.executeBatch()
          c.commit()
        } finally ins.close()
      }
    }
  }

  /** Start the continuous upload job: keyed payload stream → idempotent
    * per-batch JDBC writes. */
  def start(keyedPayloads: DataFrame, url: String, table: String,
      checkpoint: String, mode: String = "append"): StreamingQuery = {
    ensureTable(url, table)
    keyedPayloads.writeStream
      .outputMode(mode)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        writeBatch(b.toDF(), id, url, table)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
