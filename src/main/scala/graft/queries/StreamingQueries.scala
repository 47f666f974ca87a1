package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.HealthStream

/** Batch-equivalent forms of the streaming jobs (SURVEY §2, st*). The
  * exact same aggregation code runs over readStream in production;
  * StreamingSpec proves stream/batch parity on the memory sink.
  */
object StreamingQueries {

  /** Session for STATEFUL streaming keys (st19/st22): the state-store
    * partition count is `spark.sql.shuffle.partitions` CAPTURED into
    * the checkpoint at the stream's first run — one state-store
    * instance per partition. It must scale with the STREAM's rate, not
    * with whatever batch corpus shares the harness: the sf10 bench
    * scales the session conf to ~283 for the 1.2 GB corpus, which
    * spawned 283 state stores for a 60k-row feed and measured
    * 2.3 → 24.2 s on st22. Real deployments size this per streaming
    * job; these keys pin the stream's own width the same way. */
  private def streamSession(s0: SparkSession): SparkSession = {
    val s = s0.newSession()
    // 8, not 32 (r15): the feed's stateful agg keys are the handful of
    // `kind` values — 32 state-store instances spent 4x the per-batch
    // store commit/snapshot overhead to hold ~5 keys. A real deployment
    // sizes state width to the KEY cardinality x rate, not the core
    // count; 8 keeps headroom without the file churn.
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  private val tsUs = "epoch_us(CAST(ts AS TIMESTAMP))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_stream_health" -> { (s, dir) =>
      HealthStream.windowedHealth(Tables.events(s, dir))
        .orderBy(col("bucket"), col("event_type"))
    },

    "st2_stream_sessions" -> { (s, dir) =>
      HealthStream.sessions(Tables.events(s, dir), gapMinutes = 30)
        .orderBy(col("user_id"), col("session_idx"))
    },

    // streaming sequence miner, batch form: per-user event-type
    // trigrams WITH sequential positions — the grain the
    // transformWithState ListState operator emits on arrival
    // (HealthStream.seqTrigramStream; cross-batch straddle + parity in
    // StreamingSpec). One user_id exchange (st14 fold-template shape);
    // trigrams by zip-of-slices outside any lambda.
    "st16_stream_seq" -> { (s, dir) =>
      graft.operators.Sequences.userTypeTrigrams(Tables.events(s, dir))
        .orderBy(col("user_id"), col("pos"))
    },

    // streaming per-entity profile, batch form: the (user, type)
    // histogram the MapState operator (HealthStream.profileStream)
    // maintains incrementally — latest emission per cell equals this
    // (delta-emission + parity in StreamingSpec). One partial-agg
    // shuffle.
    "st17_stream_profile" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // custom DSv2 MICRO-BATCH STREAMING source (the connector trilogy
    // completed: q51 batch read with pushdown, q52 transactional sink,
    // now the streaming face the reference's polling daemons map to —
    // chStats.py:538-579 polls on a cadence; on Spark the engine
    // schedules a MicroBatchStream): each trigger admits the next
    // streamStep rows, a micro-batch plans the same closed-form range
    // partitions as the batch scan over [start,end), and exactly-once
    // falls out of the offset contract — every row belongs to precisely
    // ONE offset interval, the checkpoint is the O(1) offset itself.
    // The query RUNS the stream (3 micro-batches, complete-mode agg,
    // memory sink) and returns the final totals: the oracle's
    // closed-form range sums prove no row was dropped or double-counted
    // across batch boundaries. StreamingSpec gates the batch count and
    // stream≡batch parity.
    "st19_stream_source" -> { (s0, _) =>
      val s = streamSession(s0)
      s.catalog.dropTempView("st19_out")
      val stream = s.readStream.format("graft.sources.MetricsFeedSource")
        .option("rows", "60000").option("partitions", "4")
        .option("streamStep", "20000").load()
      val q = stream.groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("st19_out").start()
      q.processAllAvailable(); q.stop()
      s.table("st19_out").orderBy(col("kind"))
    },

    // custom DSv2 STREAMING SINK (the connector matrix's last face:
    // batch read q51/q58, batch write q52, streaming read st19 — now the
    // StreamingWrite the reference's collector POST would receive on
    // Spark): the st19 feed streams INTO AccountingSink's epoch-keyed
    // commit protocol — per-epoch task writers surrender (rows, Σ value)
    // only in WriterCommitMessages, and the driver's commit(epochId, …)
    // folds them under the (runId, epoch) key. Exactly-once under
    // recovery is the KEY's property: an engine replay of a committed
    // epoch overwrites the same key with the identical fold (StreamingSpec
    // replays a checkpoint range twice and hash-checks the totals). The
    // per-epoch rows are the output — the oracle's closed-form range sums
    // prove every epoch carries exactly its offset interval's rows.
    "st20_stream_sink" -> { (s, _) =>
      import graft.sources.AccountingSink
      val runId = "st20_stream_sink"
      AccountingSink.clear(runId)
      // fixed checkpoint path + delete (bench passes must not accumulate
      // /tmp checkpoints); recovery/replay semantics are StreamingSpec's
      // job — CORRECTNESS runs the clean 3-epoch ingest
      val cp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_st20_checkpoint")
      // symlink-safe: File.isDirectory follows links, so recursing
      // through a planted symlink under the fixed /tmp path would delete
      // the TARGET's contents — unlink the link itself instead
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
          Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(cp)
      val q = s.readStream.format("graft.sources.MetricsFeedSource")
        .option("rows", "60000").option("partitions", "4")
        .option("streamStep", "20000").load()
        .writeStream.format("graft.sources.AccountingSink")
        .option("runId", runId)
        .option("checkpointLocation", cp.getAbsolutePath)
        .outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
      import s.implicits._
      AccountingSink.epochResults(runId)
        .map { case (e, (n, sv, _)) => (e, n, sv) }
        .toDF("epoch_id", "n_rows", "sum_value")
        .orderBy(col("epoch_id"))
    },

    // STREAMING observed metrics (st21 — q74's streaming half, and the
    // production form of the pattern: a batch job can re-scan to audit,
    // a stream CANNOT — observe() is the only way to meter data quality
    // per micro-batch without forking the stream): the feed stream
    // carries an observation (rows, value mass, max id) that the engine
    // collects by accumulator per epoch and surfaces in
    // StreamingQueryProgress.observedMetrics — the monitoring channel
    // the reference's poll loop (chStats.py:538-579) maps onto. The key
    // drains 3 deterministic admission-controlled epochs through a noop
    // sink and emits the PER-EPOCH observations — closed-form range
    // sums, so a dropped or double-counted epoch breaks the hash
    // (exactly-once observed, not just exactly-once written).
    "st21_stream_observe" -> { (s, _) =>
      val stream = s.readStream.format("graft.sources.MetricsFeedSource")
        .option("rows", "60000").option("partitions", "4")
        .option("streamStep", "20000").load()
      val q = stream.observe("feed_gate",
          count(lit(1)).as("n_rows"),
          sum(col("value")).as("sum_value"),
          max(col("id")).as("max_id"))
        .writeStream.format("noop").outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val epochs = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("feed_gate")))
        .map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_value"),
          r.getAs[Long]("max_id")))
        .filter(_._1 > 0)
      import s.implicits._
      epochs.toDF("n_rows", "sum_value", "max_id").orderBy(col("max_id"))
    },

    // STREAMING SOURCE METRICS (st23 — ReportsSourceMetrics, q68's
    // custom-metric story carried into streaming and the LAG/BACKLOG
    // observability face every production stream is monitored by: what
    // Kafka surfaces as consumer lag appears in
    // StreamingQueryProgress.sources[i].metrics): the feed reports
    // rowsConsumed (the engine-committed offset handed back to the
    // source — a pure function, the admission-control restart posture)
    // and rowsBacklog (what the feed still holds beyond it); the key
    // drains 3 deterministic admission epochs through a noop sink and
    // emits each epoch's (input rows, consumed, backlog) — closed-form
    // from the offset arithmetic, so a lagging or double-reported
    // offset breaks the hash.
    "st23_source_metrics" -> { (s, _) =>
      val q = s.readStream.format("graft.sources.MetricsFeedSource")
        .option("rows", "60000").option("partitions", "4")
        .option("streamStep", "20000").load()
        .writeStream.format("noop").outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val epochs = q.recentProgress.toSeq
        .map(p => p.sources(0))
        .filter(_.numInputRows > 0)
        .map(sp => (sp.numInputRows,
          sp.metrics.get("rowsConsumed").toLong,
          sp.metrics.get("rowsBacklog").toLong))
      import s.implicits._
      epochs.toDF("n_rows", "rows_consumed", "rows_backlog")
        .orderBy(col("rows_consumed"))
    },

    // STREAMING SINK METRICS (st24 — ReportsSinkMetrics, the SINK-side
    // twin of st23's source lag and the last dark face of the streaming
    // observability matrix: what Kafka's sink reports as committed
    // offsets appears in StreamingQueryProgress.sink.metrics): the
    // engine reads metrics() from the sink TABLE after each epoch
    // (probed: ProgressContext matches the sink Table against the
    // interface), so the sink reports its CUMULATIVE epoch-keyed commit
    // registry — epochsCommitted and rowsCommitted fold the same
    // exactly-once state st20 verifies, making the metric itself
    // replay-safe (a re-committed epoch overwrites its key; the
    // cumulative total never double-counts). The key drains 3
    // deterministic admission epochs into the accounting sink and emits
    // each progress event's (output rows, cumulative rows, cumulative
    // epochs) — closed-form from the offset arithmetic.
    "st24_sink_metrics" -> { (s, _) =>
      import graft.sources.AccountingSink
      val runId = "st24_sink_metrics"
      AccountingSink.clear(runId)
      val cp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_st24_checkpoint")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
          Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(cp)
      val q = s.readStream.format("graft.sources.MetricsFeedSource")
        .option("rows", "60000").option("partitions", "4")
        .option("streamStep", "20000").load()
        .writeStream.format("graft.sources.AccountingSink")
        .option("runId", runId)
        .option("checkpointLocation", cp.getAbsolutePath)
        .outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
      val epochs = q.recentProgress.toSeq
        .filter(_.sink.numOutputRows > 0)
        .map(p => (p.sink.numOutputRows,
          p.sink.metrics.get("rowsCommitted").toLong,
          p.sink.metrics.get("epochsCommitted").toLong))
      import s.implicits._
      epochs.toDF("n_rows", "rows_committed", "epochs_committed")
        .orderBy(col("rows_committed"))
    },

    // CONTINUOUS TRIGGER (st25 — ContinuousStream, the epoch-marker
    // protocol and the LAST streaming execution mode after micro-batch
    // st19 and AvailableNow: ~1 ms-class end-to-end latency, the mode
    // Kafka ETL pipelines run for latency-critical paths; the r14
    // verdict's spike, answered YES and promoted to a key): the feed
    // declares CONTINUOUS_READ and serves fixed residue-class
    // partitions (partition r owns ids ≡ r mod parts — ownership is
    // for the stream's LIFETIME, the continuous contract) through
    // LONG-RUNNING blocking readers; the engine injects epoch markers
    // around them and checkpoints mergeOffsets' composite. Delivery is
    // at-least-once to the sink (epoch retries can duplicate), so the
    // key aggregates over the DISTINCT row set — the replay-proof
    // read-side idiom for continuous consumers. Output: per-kind
    // accounting of the complete 30k-row feed, closed-form.
    "st25_continuous" -> { (s, _) =>
      s.catalog.dropTempView("st25_out")
      // PID-scoped explicit checkpoint (st22's pattern): the r16
      // completion gate reads the engine's offset log from it
      val cp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_st25_checkpoint_${ProcessHandle.current().pid()}")
      def rmQ(f: java.io.File): Unit = {
        if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
          Option(f.listFiles).foreach(_.foreach(rmQ))
        f.delete(); ()
      }
      rmQ(cp)
      // TWO partitions, deliberately: continuous tasks OCCUPY their
      // slots for the query's lifetime, so the slot count must EXCEED
      // the partition count or any concurrent driver query on the same
      // scheduler (here: the confirming count()) starves forever —
      // probed the hard way on a local[4] test session with partitions=4
      val q = s.readStream.format("graft.sources.MetricsFeedSource")
        .option("rows", "30000").option("partitions", "2").load()
        .writeStream.format("memory").queryName("st25_out")
        .option("checkpointLocation", cp.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.Continuous("200 milliseconds"))
        .start()
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        // completion gate on the CHECKPOINT OFFSET LOG (r16): the old
        // poll ran a distinct().count() Spark job every 200 ms against
        // the memory sink — each a full-table scan contending with the
        // continuous tasks for slots (ContinuousExecution populates no
        // lastProgress, probed — the file log is the one driver-visible
        // signal without a job). Partition r's logged offset is the
        // NEXT id it would emit, so offsets ≥ rows on BOTH partitions
        // mean every feed row was emitted into a logged epoch. Reads
        // race epoch writes harmlessly (Try → retry next poll).
        def offsetsDrained(): Boolean = {
          val dir = new java.io.File(cp, "offsets")
          val last = Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
            .filter(f => f.isFile && f.getName.forall(_.isDigit))
            .sortBy(_.getName.toLong).lastOption
          last.exists(f => scala.util.Try {
            val txt = new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            val offs = "(\\d+):(\\d+)".r.findAllMatchIn(txt).toSeq
            offs.size == 2 && offs.forall(_.group(2).toLong >= 30000L)
          }.getOrElse(false))
        }
        while (!offsetsDrained() && System.nanoTime() < deadline)
          Thread.sleep(50)
        // belt: one confirming Spark job (normally a single iteration)
        // — at-least-once delivery means the logged epoch's rows are in
        // the sink once its WRITES landed; the distinct count proves it
        while (s.table("st25_out").select(col("id")).distinct.count() < 30000L &&
            System.nanoTime() < deadline) Thread.sleep(100)
      } finally q.stop()
      s.table("st25_out").distinct()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
          max(col("id")).as("max_id"))
        .orderBy(col("kind"))
    },

    // STATE-STORE READER (st22 — the engine's own streaming STATE made
    // queryable, Spark 4's `statestore` batch source; the reference's
    // monitoring ethos aimed at the one internals face still dark:
    // q74/st21 observe the DATA in flight, this audits what the
    // stateful operator has DURABLY CHECKPOINTED): run the st19 feed
    // through a streaming aggregation to a RocksDB/HDFS checkpoint,
    // then batch-read the checkpoint — `state-metadata` inventories the
    // operators (stateStoreSave / store `default` / batches 0..2) and
    // `statestore` returns the live aggregation buffers (key.kind,
    // value.count, value.sum — the PHYSICAL buffer names, probed). The
    // output reconciles the state rows closed-form against the feed
    // formulas: a state row that lost an epoch's fold, double-merged,
    // or leaked a key breaks the hash. At 100 TB this is the debugging
    // face that matters: state bugs (skew, leaks, watermark eviction)
    // are invisible in output parity but obvious in the store itself.
    "st22_state_reader" -> { (s0, _) =>
      val s = streamSession(s0)
      // PID-scoped fixed dir: stable within a JVM (bench passes reuse
      // it, rm-on-entry keeps /tmp bounded — the round-6 lesson) but
      // two concurrent JVMs can never rm each other's LIVE checkpoint
      val cp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_st22_checkpoint_${ProcessHandle.current().pid()}")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
          Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(cp)
      val q = s.readStream.format("graft.sources.MetricsFeedSource")
        .option("rows", "60000").option("partitions", "4")
        .option("streamStep", "20000").load()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .writeStream.outputMode("update").format("noop")
        .option("checkpointLocation", cp.getAbsolutePath).start()
      q.processAllAvailable(); q.stop()
      // operator inventory: exactly one stateful operator, 3 committed
      // batches — a 1-row broadcast leg (the scalar crossJoin pattern)
      val meta = s.read.format("state-metadata").load(cp.getAbsolutePath)
        .agg(max(col("maxBatchId")).as("max_batch_id"),
          count(lit(1)).as("n_operators"))
      s.read.format("statestore").option("path", cp.getAbsolutePath).load()
        .select(col("key.kind").as("kind"),
          col("value.count").as("n"), col("value.sum").as("sum_value"))
        .crossJoin(broadcast(meta))
        .orderBy(col("kind"))
    },

    // streaming ingest NEAR-DUP gate, batch form: every arriving doc is
    // checked against the PERSISTED LSH serving index (d18's incremental
    // dedup made a serving op — the index is a DerivedLayouts artifact
    // carrying band keys + shingle sets per indexed doc, built once with
    // the bucket cap applied at BUILD time, so serving is pure
    // stream-static joins: band-key probe → exact-Jaccard verify →
    // per-doc verdict). The same neardupIngestGate code runs inside
    // foreachBatch over readStream — StreamingSpec proves split-batch
    // parity. At 100 TB the index never re-hashes per batch and a
    // degenerate bucket can't explode the probe join (≤ cap·|batch|).
    "st18_stream_neardup" -> { (s, dir) =>
      import graft.operators.Dedup
      import graft.sources.DerivedLayouts
      val base = DerivedLayouts.once(s"neardupidx|$dir") { path =>
        Dedup.neardupServingIndex(
            Tables.documents(s, dir).filter(expr("doc_id % 5 != 4")),
            "doc_id", "text", bands = 4, rows = 2, maxBucket = 64)
          .write.parquet(s"$path/index")
      }
      val index = s.read.parquet(s"$base/index")
      val batch = Tables.documents(s, dir).filter(expr("doc_id % 5 = 4"))
      Dedup.neardupIngestGate(batch, index, "doc_id", "text",
          bands = 4, rows = 2, threshold = 0.3)
        .orderBy(col("doc_id"))
    },

    // streaming ingest quality gate, batch form: the same qualityGate
    // code runs over readDocumentStream on arrival (parity + bounded
    // sources×2 state in StreamingSpec); per-(source, kept) counters
    // + kept token mass are the ingest dashboard's rows.
    "st15_stream_quality" -> { (s, dir) =>
      HealthStream.qualityGate(Tables.documents(s, dir))
        .orderBy(col("source"), col("kept"))
    },

    // streaming-ingest dedup, batch form: keep the earliest event per
    // (user, type) key. The streaming path is dropDuplicatesWithinWatermark
    // (state bounded by the watermark) — parity in StreamingSpec; this
    // batch form pins the stronger earliest-event semantics. Plans with
    // a partial WindowGroupLimit (rank pushdown), not a full sort.
    "st4_stream_dedup" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("ts_us").as("first_ts_us"), col("event_id").as("first_event_id"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // stream-static broadcast enrichment + windowed agg, batch form;
    // streaming parity (same code over readStream) in StreamingSpec.
    "st5_stream_enrich" -> { (s, dir) =>
      HealthStream.enrichedHealth(Tables.events(s, dir),
          Tables.customer(s, dir), Tables.nation(s, dir))
        .orderBy(col("bucket"), col("nation"))
    },

    // event-sequence funnel (click → error within 10 min per user),
    // batch form; the same code runs as a watermarked stream-stream
    // inner join — parity in StreamingSpec.
    "st6_stream_funnel" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      HealthStream.clickErrorFunnel(ev, ev, windowMinutes = 10)
        .orderBy(col("user_id"), col("click_id"), col("error_id"))
    },

    // left-outer funnel: clicks that never led to an error inside the
    // window surface with NULL error columns — the "where did the
    // funnel leak" query. Streaming = watermarked stream-stream LEFT
    // OUTER join (unmatched rows emit when the watermark passes their
    // horizon); parity in StreamingSpec via a sentinel event.
    "st8_funnel_outer" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      HealthStream.clickErrorFunnelOuter(ev, ev, windowMinutes = 10)
        .orderBy(col("user_id"), col("click_id"),
          col("error_id").asc_nulls_first)
    },

    // sliding-window rate monitor (10-min windows every 5 min): each
    // event expands to width÷slide window rows MAP-SIDE before the one
    // hash shuffle — overlap costs ×2 input rows, never a self-join or
    // re-scan. Streaming parity (same code over readStream) in
    // StreamingSpec.
    // windowed p95 monitor: the full distribution never materializes —
    // a 16-bucket integer histogram rides one windowed agg as k
    // columns, p95 derives map-side. Parity in StreamingSpec.
    "st10_stream_p95" -> { (s, dir) =>
      HealthStream.windowedP95(Tables.events(s, dir))
        .orderBy(col("bucket"))
    },

    // windowed distinct-entity counts in the streaming-legal shape
    // (dedup-then-count instead of a distinct agg); the same code runs
    // over readStream with both stateful stages watermark-bounded —
    // parity in StreamingSpec.
    "st9_stream_distinct" -> { (s, dir) =>
      HealthStream.windowedDistinctUsers(Tables.events(s, dir))
        .orderBy(col("bucket"), col("event_type"))
    },

    // windowed approximate distinct users — the streaming HLL sketch:
    // 64 registers as 64 max() agg columns, 64 longs of state per
    // window at any cardinality (st9's exact dedup-then-count holds
    // per-user state; this is its constant-state sibling, the same
    // trade m35 makes in batch). Parity in StreamingSpec.
    "st11_stream_hll" -> { (s, dir) =>
      HealthStream.windowedHllDistinct(Tables.events(s, dir))
        .orderBy(col("bucket"))
    },

    // windowed DOMAIN-FREE p95 — m47's streaming face: octave bins
    // (integer floor-log2 of cents) as 63 fixed count columns, so the
    // per-window state is 63 longs at ANY value magnitude — st10's
    // grid assumes values < 512, this assumes only BIGINT. Estimate =
    // octave inclusive max (never under, ≤2× over). Parity in
    // StreamingSpec.
    "st12_stream_log_p95" -> { (s, dir) =>
      HealthStream.windowedLogP95(Tables.events(s, dir))
        .orderBy(col("bucket"))
    },

    // windowed count-min frequency watchlist — m32's streaming face
    // (sketch family's third streaming member after st11 HLL and st12
    // log-p95): per-key windowed counts over an unbounded key space as
    // a 2×64 CMS riding 128 sum columns = 128 longs of state per
    // window at ANY cardinality; frequencies answered for a fixed
    // 8-key watchlist via two O(1) bucket lookups, one-sided error
    // (cms_n ≥ true) asserted in StreamingSpec. Parity in StreamingSpec.
    "st13_stream_cms" -> { (s, dir) =>
      HealthStream.windowedCmsWatchlist(Tables.events(s, dir),
          probes = (0L until 8L).map(_ * 10))
        .orderBy(col("bucket"), col("key"))
    },

    "st7_sliding_rate" -> { (s, dir) =>
      HealthStream.slidingRate(Tables.events(s, dir))
        .orderBy(col("win_start"))
    },

    // per-key alert COOLDOWN, batch-fold form: an error alerts only if
    // ≥10 min has passed since the key's last RAISED alert — a
    // recursive dependency on the operator's own output (which prior
    // events alerted decides the next decision) that no window frame
    // expresses; the fold is the one sequential pass. The streaming
    // production form is Spark 4 transformWithState with two ValueState
    // longs per key in RocksDB (HealthStream.alertCooldownStream);
    // parity + cross-batch state proven in StreamingSpec. Scale shape:
    // one hash shuffle on user_id; the fold runs on aggregate rows
    // (per-user error arrays), O(errors-per-user) each, via ONE
    // aggregate() HOF pass (the st12 O(n) finish lesson).
    "st14_alert_cooldown" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_errors"),
          array_sort(collect_list(struct(col("ts_us"), col("event_id")))).as("seq"))
        .withColumn("acc", expr(
          s"aggregate(seq, named_struct('last', CAST(${HealthStream.CooldownSentinelUs} AS BIGINT), " +
          "'n', CAST(0 AS BIGINT)), (acc, x) -> " +
          "IF(x.ts_us - acc.last >= 600000000, " +
          "named_struct('last', x.ts_us, 'n', acc.n + 1), acc))"))
        .select(col("user_id"), col("n_errors"),
          col("acc.n").as("n_alerts"), col("acc.last").as("last_alert_us"))
        .orderBy(col("user_id"))
    },

    // native session windows (merge while gap < 30 min; window end =
    // last event + gap). Streaming-capable as-is (state store backed).
    "st3_session_window" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("w.start").cast("timestamp_ntz").as("session_start"),
          col("w.end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }
  )

  def oracles: Map[String, String] = Map(
    "st17_stream_profile" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    "st16_stream_seq" ->
      s"""WITH tl AS (SELECT user_id,
         |    list(event_type ORDER BY $tsUs, event_id) AS types
         |  FROM events GROUP BY user_id),
         |ix AS (SELECT user_id, types,
         |    unnest(generate_series(1, greatest(len(types) - 2, 0))) AS i
         |  FROM tl)
         |SELECT user_id, CAST(i AS BIGINT) AS pos,
         |  types[i] || ' ' || types[i+1] || ' ' || types[i+2] AS trigram
         |FROM ix ORDER BY user_id, pos""".stripMargin,

    "st19_stream_source" ->
      """SELECT kind, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value) AS BIGINT) AS sum_value
        |FROM (
        |  SELECT CASE CAST(id % 3 AS INT) WHEN 0 THEN 'gauge'
        |      WHEN 1 THEN 'counter' ELSE 'timer' END AS kind,
        |    (id * 2654435761) % 100000 AS value
        |  FROM range(0, 60000) t(id)) u
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // offset arithmetic: epoch e consumes through e·20000, leaving
    // 60000 − e·20000 behind
    "st23_source_metrics" ->
      """SELECT CAST(20000 AS BIGINT) AS n_rows,
        |  CAST(e * 20000 AS BIGINT) AS rows_consumed,
        |  CAST(60000 - e * 20000 AS BIGINT) AS rows_backlog
        |FROM generate_series(1, 3) t(e)
        |ORDER BY rows_consumed""".stripMargin,

    // the complete feed through the continuous protocol, deduped
    // read-side (at-least-once delivery)
    "st25_continuous" ->
      """SELECT kind, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value) AS BIGINT) AS sum_value,
        |  CAST(max(id) AS BIGINT) AS max_id
        |FROM (
        |  SELECT id, CASE CAST(id % 3 AS INT) WHEN 0 THEN 'gauge'
        |      WHEN 1 THEN 'counter' ELSE 'timer' END AS kind,
        |    (id * 2654435761) % 100000 AS value
        |  FROM range(0, 30000) t(id)) u
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // cumulative commit-registry fold after epoch e: e·20000 rows, e
    // epochs — the exactly-once state surfaced as sink metrics
    "st24_sink_metrics" ->
      """SELECT CAST(20000 AS BIGINT) AS n_rows,
        |  CAST(e * 20000 AS BIGINT) AS rows_committed,
        |  CAST(e AS BIGINT) AS epochs_committed
        |FROM generate_series(1, 3) t(e)
        |ORDER BY rows_committed""".stripMargin,

    // the durable state must equal the full-feed aggregation (every
    // epoch folded exactly once); 3 admission epochs → max batch id 2
    "st22_state_reader" ->
      """SELECT kind, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value) AS BIGINT) AS sum_value,
        |  CAST(2 AS BIGINT) AS max_batch_id,
        |  CAST(1 AS BIGINT) AS n_operators
        |FROM (
        |  SELECT CASE CAST(id % 3 AS INT) WHEN 0 THEN 'gauge'
        |      WHEN 1 THEN 'counter' ELSE 'timer' END AS kind,
        |    (id * 2654435761) % 100000 AS value
        |  FROM range(0, 60000) t(id)) u
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // each epoch is exactly one 20000-row offset interval of the feed
    "st20_stream_sink" ->
      """SELECT CAST(id // 20000 AS BIGINT) AS epoch_id,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum((id * 2654435761) % 100000) AS BIGINT) AS sum_value
        |FROM range(0, 60000) t(id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // one observation row per 20000-row admission epoch
    "st21_stream_observe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum((id * 2654435761) % 100000) AS BIGINT) AS sum_value,
        |  CAST(max(id) AS BIGINT) AS max_id
        |FROM range(0, 60000) t(id)
        |GROUP BY id // 20000 ORDER BY max_id""".stripMargin,

    // the full pipeline re-derived: band keys for every doc, the bucket
    // cap applied over INDEX occupancy only (the build-time rule), batch
    // probes, exact Jaccard on distinct 3-gram sets (d16's list forms)
    "st18_stream_neardup" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS wd
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(wd) >= 3
        |    THEN list_transform(generate_series(1, len(wd)-2), i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2])
        |    ELSE [] END) AS s
        |  FROM w),
        |sh2 AS (SELECT * FROM sh WHERE len(s) > 0),
        |sig AS (SELECT doc_id,
        |  list_transform(generate_series(0, 7), h ->
        |    list_min(list_transform(s, x -> md5(CAST(h AS VARCHAR) || '|' || x)))) AS g
        |  FROM sh2),
        |bands AS (SELECT doc_id, CAST(b AS VARCHAR) || ':' || g[2*b+1] || g[2*b+2] AS k
        |  FROM sig, generate_series(0, 3) t(b)),
        |ib AS (SELECT * FROM bands WHERE doc_id % 5 != 4
        |  QUALIFY count(*) OVER (PARTITION BY k) <= 64),
        |bb AS (SELECT * FROM bands WHERE doc_id % 5 = 4),
        |cand AS (SELECT DISTINCT b.doc_id, i.doc_id AS idx_id
        |  FROM bb b JOIN ib i USING (k)),
        |jac AS (SELECT c.doc_id, c.idx_id,
        |    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |      / len(list_distinct(x.s || y.s)) AS j
        |  FROM cand c JOIN sh2 x ON c.doc_id = x.doc_id
        |    JOIN sh2 y ON c.idx_id = y.doc_id),
        |ver AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dups,
        |    min(idx_id) AS min_dup
        |  FROM jac WHERE j >= 0.3 GROUP BY 1),
        |ca AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM cand GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(n_candidates, 0::BIGINT) AS n_candidates,
        |  coalesce(n_dups, 0::BIGINT) AS n_dups,
        |  CAST(coalesce(min_dup, -1) AS BIGINT) AS min_dup_id,
        |  CAST(CASE WHEN coalesce(n_dups, 0) > 0 THEN 1 ELSE 0 END AS INT) AS is_dup
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 4) d
        |LEFT JOIN ca USING (doc_id) LEFT JOIN ver USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "st15_stream_quality" ->
      """WITH d AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |q AS (SELECT source, CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(w)) * 10000 // len(w) AS BIGINT) AS q_bp
        |  FROM d)
        |SELECT source,
        |  CAST(CASE WHEN q_bp >= 4500 AND n_tokens >= 20 THEN 1 ELSE 0 END AS INT) AS kept,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN q_bp >= 4500 AND n_tokens >= 20
        |    THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM q GROUP BY 1, 2 ORDER BY source, kept""".stripMargin,

    // NOTE: deliberately a recursive CTE, not list_reduce — DuckDB
    // 1.0's list_reduce mis-folds when list lengths vary across rows
    // (verified minimal repro: 3-row fold returns a wrong accumulator
    // on the shorter rows). The recursion IS the sequential semantics.
    "st14_alert_cooldown" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, $tsUs AS ts_us, event_id,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY $tsUs, event_id) AS BIGINT) AS rn
         |  FROM events WHERE event_type = 'error'),
         |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors
         |  FROM e GROUP BY user_id),
         |walk(user_id, rn, last_alert, n_alerts) AS (
         |  SELECT user_id, CAST(0 AS BIGINT),
         |    CAST(${HealthStream.CooldownSentinelUs} AS BIGINT), CAST(0 AS BIGINT) FROM n
         |  UNION ALL
         |  SELECT w.user_id, e.rn,
         |    CASE WHEN e.ts_us - w.last_alert >= 600000000
         |         THEN e.ts_us ELSE w.last_alert END,
         |    CASE WHEN e.ts_us - w.last_alert >= 600000000
         |         THEN w.n_alerts + 1 ELSE w.n_alerts END
         |  FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
         |SELECT n.user_id, n.n_errors, w.n_alerts, w.last_alert AS last_alert_us
         |FROM walk w JOIN n ON n.user_id = w.user_id AND w.rn = n.n_errors
         |ORDER BY n.user_id""".stripMargin,

    "st11_stream_hll" ->
      s"""WITH h AS (SELECT make_timestamp($tsUs - $tsUs % 300000000) AS bucket,
         |    md5('hll|' || CAST(user_id AS VARCHAR)) AS _h FROM events),
         |t AS (SELECT bucket, _h, substr(_h, 3, 12) AS tail,
         |    length(regexp_extract(substr(_h, 3, 12), '^0*')) AS lz FROM h),
         |rk AS (SELECT bucket,
         |    ((strpos('0123456789abcdef', substr(_h, 1, 1)) - 1) * 16 +
         |     (strpos('0123456789abcdef', substr(_h, 2, 1)) - 1)) % 64 AS idx,
         |    CASE WHEN lz >= 12 THEN 49 ELSE lz * 4 +
         |      (CASE WHEN strpos('0123456789abcdef', substr(tail, lz + 1, 1)) - 1 >= 8 THEN 0
         |            WHEN strpos('0123456789abcdef', substr(tail, lz + 1, 1)) - 1 >= 4 THEN 1
         |            WHEN strpos('0123456789abcdef', substr(tail, lz + 1, 1)) - 1 >= 2 THEN 2
         |            ELSE 3 END) + 1 END AS rnk
         |  FROM t),
         |regs AS (SELECT bucket, idx, max(rnk) AS mreg FROM rk GROUP BY 1, 2),
         |sk AS (SELECT bucket, CAST(count(*) AS INT) AS n_hit,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(50 - mreg AS INT)) AS BIGINT) AS s_present
         |  FROM regs GROUP BY 1)
         |SELECT bucket, n_hit,
         |  2904064 * CAST(1099511627776 AS BIGINT) //
         |    (1000 * ((s_present + (64 - n_hit) * CAST(1125899906842624 AS BIGINT)) // 1024))
         |    AS est_distinct
         |FROM sk ORDER BY bucket""".stripMargin,

    "st13_stream_cms" ->
      s"""WITH ev AS (SELECT make_timestamp($tsUs - $tsUs % 300000000) AS bucket,
         |    CAST(user_id AS VARCHAR) AS key FROM events),
         |b AS (SELECT bucket,
         |    ((strpos('0123456789abcdef', substr(md5('cms|' || key), 1, 1)) - 1) * 16 +
         |     strpos('0123456789abcdef', substr(md5('cms|' || key), 2, 1)) - 1) % 64 AS b0,
         |    ((strpos('0123456789abcdef', substr(md5('cms|' || key), 3, 1)) - 1) * 16 +
         |     strpos('0123456789abcdef', substr(md5('cms|' || key), 4, 1)) - 1) % 64 AS b1
         |  FROM ev),
         |c0 AS (SELECT bucket, b0 AS b, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
         |c1 AS (SELECT bucket, b1 AS b, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
         |w AS (SELECT DISTINCT bucket FROM ev),
         |pk AS (SELECT CAST(u * 10 AS VARCHAR) AS key,
         |    ((strpos('0123456789abcdef', substr(md5('cms|' || CAST(u * 10 AS VARCHAR)), 1, 1)) - 1) * 16 +
         |     strpos('0123456789abcdef', substr(md5('cms|' || CAST(u * 10 AS VARCHAR)), 2, 1)) - 1) % 64 AS b0,
         |    ((strpos('0123456789abcdef', substr(md5('cms|' || CAST(u * 10 AS VARCHAR)), 3, 1)) - 1) * 16 +
         |     strpos('0123456789abcdef', substr(md5('cms|' || CAST(u * 10 AS VARCHAR)), 4, 1)) - 1) % 64 AS b1
         |  FROM generate_series(0, 7) t(u))
         |SELECT w.bucket, pk.key,
         |  least(coalesce(c0.c, 0), coalesce(c1.c, 0)) AS cms_n
         |FROM w CROSS JOIN pk
         |LEFT JOIN c0 ON c0.bucket = w.bucket AND c0.b = pk.b0
         |LEFT JOIN c1 ON c1.bucket = w.bucket AND c1.b = pk.b1
         |ORDER BY 1, 2""".stripMargin,

    "st10_stream_p95" ->
      s"""WITH base AS (SELECT make_timestamp($tsUs - $tsUs % 300000000) AS bucket,
         |    CAST(greatest(0, least(15, CAST(round(value * 100) AS BIGINT) // 3200)) AS INT) AS vb
         |  FROM events),
         |b AS (SELECT bucket, vb, count(*) AS c FROM base GROUP BY 1, 2),
         |t AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n_total FROM b GROUP BY 1),
         |cu AS (SELECT bucket, vb,
         |    CAST(sum(c) OVER (PARTITION BY bucket ORDER BY vb
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM b)
         |SELECT cu.bucket, t.n_total,
         |  CAST(min(CASE WHEN cum * 100 >= 95 * n_total THEN vb END) AS INT) AS p95_bucket,
         |  CAST((min(CASE WHEN cum * 100 >= 95 * n_total THEN vb END) + 1) * 32 AS INT) AS p95_ub
         |FROM cu JOIN t ON cu.bucket = t.bucket
         |GROUP BY cu.bucket, t.n_total ORDER BY cu.bucket""".stripMargin,

    "st12_stream_log_p95" ->
      s"""WITH base AS (SELECT make_timestamp($tsUs - $tsUs % 300000000) AS bucket,
         |    CASE WHEN CAST(round(value * 100) AS BIGINT) <= 0 THEN 0
         |         ELSE CAST(least(62, length(bin(CAST(round(value * 100) AS BIGINT)))) AS INT) END AS ob
         |  FROM events),
         |b AS (SELECT bucket, ob, count(*) AS c FROM base GROUP BY 1, 2),
         |t AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n_total FROM b GROUP BY 1),
         |cu AS (SELECT bucket, ob,
         |    CAST(sum(c) OVER (PARTITION BY bucket ORDER BY ob
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM b)
         |SELECT cu.bucket, t.n_total,
         |  CAST(min(CASE WHEN cum * 100 >= 95 * n_total THEN ob END) AS INT) AS p95_octave,
         |  CAST((CAST(1 AS BIGINT) << CAST(min(CASE WHEN cum * 100 >= 95 * n_total THEN ob END) AS INT)) - 1 AS BIGINT) AS p95_ub_cents
         |FROM cu JOIN t ON cu.bucket = t.bucket
         |GROUP BY cu.bucket, t.n_total ORDER BY cu.bucket""".stripMargin,

    "st9_stream_distinct" ->
      s"""SELECT make_timestamp($tsUs - $tsUs % 300000000) AS bucket, event_type,
         |  count(DISTINCT user_id) AS n_users
         |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "st1_stream_health" ->
      s"""SELECT make_timestamp($tsUs - $tsUs % 300000000) AS bucket, event_type,
         |  count(*) AS n,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
         |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "st2_stream_sessions" ->
      s"""SELECT user_id, session_idx, min(ts_us) AS start_us, max(ts_us) AS end_us,
         |  count(*) AS n_events
         |FROM (
         |  SELECT user_id, ts_us,
         |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM (
         |    SELECT user_id, event_id, $tsUs AS ts_us,
         |      CASE WHEN $tsUs - lag($tsUs) OVER (PARTITION BY user_id ORDER BY $tsUs, event_id) > 1800000000
         |           THEN 1
         |           WHEN lag($tsUs) OVER (PARTITION BY user_id ORDER BY $tsUs, event_id) IS NULL
         |           THEN 1 ELSE 0 END AS new_session
         |    FROM events) a) b
         |GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,

    "st4_stream_dedup" ->
      s"""SELECT user_id, event_type, ts_us AS first_ts_us, event_id AS first_event_id
         |FROM (SELECT user_id, event_type, event_id, $tsUs AS ts_us,
         |    row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY $tsUs, event_id) AS rn
         |  FROM events) t
         |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "st5_stream_enrich" ->
      s"""SELECT bucket, nation, count(*) AS n_events,
         |  CAST(sum(is_err) AS BIGINT) AS n_errors
         |FROM (SELECT make_timestamp($tsUs - $tsUs % 600000000) AS bucket,
         |    coalesce(n_name, 'UNKNOWN') AS nation,
         |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
         |  FROM events e LEFT JOIN
         |    (SELECT c_custkey, n_name FROM customer
         |      JOIN nation ON c_nationkey = n_nationkey) d
         |    ON e.user_id = d.c_custkey) t
         |GROUP BY bucket, nation ORDER BY bucket, nation""".stripMargin,

    "st6_stream_funnel" ->
      s"""SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
         |  (epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))) AS gap_us
         |FROM events c JOIN events e
         |  ON c.user_id = e.user_id
         |WHERE c.event_type = 'click' AND e.event_type = 'error'
         |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= epoch_us(CAST(c.ts AS TIMESTAMP))
         |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) < epoch_us(CAST(c.ts AS TIMESTAMP)) + 600000000
         |ORDER BY 1, click_id, error_id""".stripMargin,

    "st8_funnel_outer" ->
      s"""SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
         |  (epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))) AS gap_us
         |FROM (SELECT * FROM events WHERE event_type = 'click') c
         |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
         |  ON c.user_id = e.user_id
         |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= epoch_us(CAST(c.ts AS TIMESTAMP))
         |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) < epoch_us(CAST(c.ts AS TIMESTAMP)) + 600000000
         |ORDER BY c.user_id, click_id, error_id NULLS FIRST""".stripMargin,

    // every event contributes to exactly width/slide = 2 sliding
    // windows: starts t - t%slide and t - t%slide - slide.
    "st7_sliding_rate" ->
      s"""SELECT make_timestamp(ws) AS win_start,
         |  make_timestamp(ws + 600000000) AS win_end,
         |  count(*) AS n_total, CAST(sum(is_err) AS BIGINT) AS n_errors,
         |  CAST(CAST(sum(is_err) AS BIGINT) * 100 // count(*) AS INT) AS err_pct
         |FROM (
         |  SELECT $tsUs - $tsUs % 300000000 - 300000000 * i AS ws,
         |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
         |  FROM events, generate_series(0, 1) t(i)) e
         |GROUP BY ws ORDER BY win_start""".stripMargin,

    // session_window merges while diff < gap (strict), so the break
    // condition here is >= — unlike st2's > (sub-µs distinction only).
    "st3_session_window" ->
      s"""SELECT user_id, make_timestamp(min(ts_us)) AS session_start,
         |  make_timestamp(max(ts_us) + 1800000000) AS session_end,
         |  count(*) AS n_events
         |FROM (
         |  SELECT user_id, ts_us,
         |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM (
         |    SELECT user_id, event_id, $tsUs AS ts_us,
         |      CASE WHEN $tsUs - lag($tsUs) OVER (PARTITION BY user_id ORDER BY $tsUs, event_id) >= 1800000000
         |           THEN 1
         |           WHEN lag($tsUs) OVER (PARTITION BY user_id ORDER BY $tsUs, event_id) IS NULL
         |           THEN 1 ELSE 0 END AS new_session
         |    FROM events) a) b
         |GROUP BY user_id, session_idx ORDER BY user_id, session_start""".stripMargin
  )
}
