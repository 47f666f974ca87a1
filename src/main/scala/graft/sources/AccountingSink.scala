package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2 SINK — MetricsFeedSource's write-side twin,
  * completing the connector surface (source read planning there; the
  * full V2 write protocol here). The reference's emit half
  * (uploadEvents, chStats.py:384-427) POSTs accounting records to a
  * collector; on Spark the idiomatic shape is a BatchWrite whose
  * per-task writers stream rows out and whose COMMIT MESSAGES carry
  * the accounting — totals come from the transaction protocol itself,
  * not from a second counting pass over the data.
  *
  * Exactly-once accounting at 1000 executors: each task's DataWriter
  * accumulates (rows, Σ value) locally and surrenders it only in its
  * WriterCommitMessage; Spark delivers messages ONLY from the one
  * successful attempt of each task (retried/speculative attempts are
  * aborted and their counts discarded — abort() is the proof hook the
  * spec exercises), and the driver-side commit() is the single
  * transaction point where per-task messages fold into the run total.
  * A failed job never publishes a partial result: commit() is simply
  * never called, which the spec also pins.
  *
  * State lives per `runId` option so concurrent writes don't collide;
  * results()/aborts() are the test-observable surface. */
object AccountingSink {
  /** runId -> (n_rows, sum_value, n_writers) from a COMMITTED write. */
  private val committed = new ConcurrentHashMap[String, (Long, Long, Int)]()
  /** (runId, epochId) -> (n_rows, sum_value, n_writers) from a COMMITTED
    * streaming epoch. Keying by epoch is what makes the streaming sink
    * exactly-once under recovery: when the engine REPLAYS an epoch whose
    * sink commit ran but whose source commit was lost (the crash window
    * the checkpoint protocol defines), the re-commit folds the identical
    * messages into the same key — an idempotent overwrite, never a
    * double-count. */
  private val epochCommitted =
    new ConcurrentHashMap[(String, Long), (Long, Long, Int)]()
  /** runId -> count of aborted task attempts (accounting discarded).
    * NOTE: recordAbort runs in DataWriter.abort() ON EXECUTORS and
    * writes to this JVM-static map, so the counter is observable only
    * in local mode — it is a TEST HOOK proving the abort path fired,
    * not a cluster-valid metric. The committed path has no such caveat
    * (commit() folds WriterCommitMessages on the driver); on a real
    * cluster, abort accounting would ride the message protocol too. */
  private val aborted = new ConcurrentHashMap[String, Integer]()

  def result(runId: String): Option[(Long, Long, Int)] =
    Option(committed.get(runId))
  def abortedTasks(runId: String): Int =
    Option(aborted.get(runId)).map(_.intValue).getOrElse(0)
  def clear(runId: String): Unit = {
    committed.remove(runId); aborted.remove(runId)
    epochResults(runId).foreach { case (e, _) => epochCommitted.remove((runId, e)) }
  }
  /** Committed streaming epochs for a run, epoch-ordered. */
  def epochResults(runId: String): Seq[(Long, (Long, Long, Int))] = {
    import scala.jdk.CollectionConverters._
    epochCommitted.asScala.collect {
      case ((r, e), v) if r == runId => e -> v
    }.toSeq.sortBy(_._1)
  }

  private[sources] def publish(runId: String, v: (Long, Long, Int)): Unit =
    committed.put(runId, v)
  private[sources] def publishEpoch(runId: String, epochId: Long,
      v: (Long, Long, Int)): Unit =
    epochCommitted.put((runId, epochId), v)
  private[sources] def recordAbort(runId: String): Unit =
    aborted.merge(runId, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))

  case class TaskAccounting(rows: Long, sumValue: Long)
    extends WriterCommitMessage
}

class AccountingSink extends TableProvider {
  // the sink accepts whatever schema the query writes
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AccountingTable(schema, properties.getOrDefault("runId", "default"))
}

class AccountingTable(schema0: StructType, runId: String = "default")
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.read.streaming.ReportsSinkMetrics {
  override def name(): String = "accounting_sink"
  override def schema(): StructType = schema0
  // ---- ReportsSinkMetrics (st24 — the SINK-side twin of st23's source
  // lag metrics, completing the streaming observability matrix: what
  // Kafka's sink reports as committed offsets appears in
  // StreamingQueryProgress.sink.metrics): the engine reads metrics()
  // from the sink TABLE after each epoch's progress event (probed:
  // ProgressContext matches the sink Table against this interface), so
  // the values must be cumulative run-level state — here the fold of
  // the epoch-keyed commit registry, which makes the metric exactly
  // the exactly-once observable: a replayed epoch overwrites its key
  // and the cumulative total never double-counts.
  override def metrics(): util.Map[String, String] = {
    val eps = AccountingSink.epochResults(runId)
    java.util.Map.of(
      "epochsCommitted", eps.size.toString,
      "rowsCommitted", eps.map(_._2._1).sum.toString)
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new AccountingWrite(
        info.options.getOrDefault("runId", "default"), info.schema())
    }
}

/** q68's sink half: rows streamed through the writers surface as a SQL
  * metric on the write node — the commit-message accounting becomes
  * driver-visible observability, not just a registry entry. */
class SinkRowsWrittenMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "sink_rows_written"
  override def description(): String = "rows streamed through the accounting writers"
}
case class SinkTaskMetric(metricValue: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = "sink_rows_written"
  override def value(): Long = metricValue
}

class AccountingWrite(runId: String, schema: StructType) extends Write {
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new SinkRowsWrittenMetric)
  private def valueIdx: Int = schema.fields.indexWhere(f =>
    f.name == "value" && f.dataType == LongType)
  private def fold(messages: Array[WriterCommitMessage]): (Long, Long, Int) = {
    var rows = 0L
    var sv = 0L
    messages.foreach { case AccountingSink.TaskAccounting(r, s) =>
      rows += r; sv += s
    }
    (rows, sv, messages.length)
  }

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : DataWriterFactory =
      new AccountingWriterFactory(runId, valueIdx)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      AccountingSink.publish(runId, fold(messages))
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  /** The STREAMING face of the same commit protocol (st20 — the
    * connector matrix's last surface after batch read q51/q58, batch
    * write q52, streaming read st19): per-epoch task writers surrender
    * their accounting only in WriterCommitMessages, and the driver's
    * epoch-keyed commit IS the exactly-once point — an engine replay of
    * a committed epoch (the crash window between sink commit and
    * checkpoint commit) re-folds identical messages into the same
    * (runId, epochId) key, so totals never double-count. */
  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : StreamingDataWriterFactory =
      new AccountingStreamingWriterFactory(runId, valueIdx)
    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit =
      AccountingSink.publishEpoch(runId, epochId, fold(messages))
    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = ()
  }
}

class AccountingStreamingWriterFactory(runId: String, valueIdx: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new AccountingWriterFactory(runId, valueIdx).createWriter(partitionId, taskId)
}

class AccountingWriterFactory(runId: String, valueIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var rows = 0L
    private var sumValue = 0L
    override def write(record: InternalRow): Unit = {
      rows += 1
      if (valueIdx >= 0 && !record.isNullAt(valueIdx))
        sumValue += record.getLong(valueIdx)
    }
    override def commit(): WriterCommitMessage =
      AccountingSink.TaskAccounting(rows, sumValue)
    override def abort(): Unit = AccountingSink.recordAbort(runId)
    override def currentMetricsValues()
        : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      Array(SinkTaskMetric(rows))
    override def close(): Unit = ()
  }
}
