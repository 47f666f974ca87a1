package graft.streaming

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Leader election among N identical jobs — the reference's `amISuper`
  * gate (chStats.py:370-382: every poller computes, only the elected
  * "super" node uploads; chStats.py:540-546 re-checks each cycle so a
  * dead leader is replaced within one cadence) re-expressed for Spark
  * streaming sinks.
  *
  * Shape at cluster scale: N identical drivers each run the same
  * streaming query; every micro-batch the sink asks the gate and only
  * the current leader writes. Leadership is a LEASE (holder id +
  * refresh epoch) that the leader renews on every batch; a lease older
  * than `ttlMs` is dead and the next contender claims it. Failover is
  * therefore bounded by ttl + one trigger interval, and a paused-then-
  * resumed ex-leader (GC pause, network partition) finds its lease
  * expired and demotes itself instead of double-writing. Combined with
  * an idempotent per-batch writer (JdbcSink's delete-by-batchId) even
  * the pathological handover race — old leader writing batch k while
  * the new one rewrites it — converges to the same final state.
  *
  * This implementation keeps the lease in a shared directory because
  * the test rig is one machine with a POSIX fs; the claim critical
  * section is serialized by an OS `FileChannel` lock, so concurrent
  * contenders in separate JVMs are safe. On a real cluster the same
  * three operations (read lease, renew own, claim stale) map onto any
  * CAS store — the reference uses a redis key, Kubernetes uses a Lease
  * object — without touching the sink code.
  *
  * `clock` is injectable so specs exercise expiry deterministically
  * instead of sleeping.
  */
final class LeaderGate(leaseDir: String, val id: String, ttlMs: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val dir: Path = {
    val p = Paths.get(leaseDir)
    Files.createDirectories(p)
    p
  }
  private val leaseFile: Path = dir.resolve("leader.lease")
  private val lockFile: Path = dir.resolve("leader.lock")

  // FileChannel.lock serializes contenders in SEPARATE JVMs (the real
  // deployment: N drivers) but THROWS OverlappingFileLockException for
  // two channels in one JVM (two queries sharing a driver, or a spec) —
  // so the OS lock sits inside a JVM-wide monitor per lease path.
  private val jvmMonitor = LeaderGate.monitorFor(lockFile)

  private def withClaimLock[A](f: => A): A = jvmMonitor.synchronized {
    val ch = FileChannel.open(lockFile,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try f finally lock.release()
    } finally ch.close()
  }

  private def readLease(): Option[(String, Long)] =
    if (!Files.exists(leaseFile)) None
    else {
      val parts = new String(Files.readAllBytes(leaseFile),
        StandardCharsets.UTF_8).trim.split(' ')
      if (parts.length == 2) scala.util.Try(parts(1).toLong).toOption
        .map(ts => (parts(0), ts))
      else None // torn/garbage lease: treat as absent, claimable
    }

  private def writeLease(now: Long): Unit =
    Files.write(leaseFile, s"$id $now".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)

  /** True iff this job is the leader after this call: renews an owned
    * lease, claims an absent or expired one, yields to a live one. */
  def tryAcquire(): Boolean = withClaimLock {
    val now = clock()
    readLease() match {
      case Some((holder, _)) if holder == id => writeLease(now); true
      case Some((_, ts)) if now - ts <= ttlMs => false
      case _ => writeLease(now); true // absent, expired, or torn
    }
  }

  /** Drop leadership immediately (clean shutdown → instant failover,
    * no ttl wait). A non-leader's release is a no-op. */
  def release(): Unit = withClaimLock {
    readLease() match {
      case Some((holder, _)) if holder == id => Files.deleteIfExists(leaseFile)
      case _ => ()
    }
  }

  /** Wrap a foreachBatch writer so only the current leader executes it;
    * followers skip the batch (their engine still checkpoints progress,
    * matching the reference where non-super pollers keep polling but
    * never upload). */
  def gated[T](write: (T, Long) => Unit, onSkip: T => Unit = (_: T) => ()):
      (T, Long) => Unit =
    (batch: T, batchId: Long) =>
      if (tryAcquire()) write(batch, batchId) else onSkip(batch)

  /** foreachBatch adapter: a follower still EVALUATES the whole batch —
    * Spark 4 validates that every stateful partition commits its state
    * store even when output is discarded (and the reference's non-super
    * pollers likewise keep polling; they only skip the upload) — but
    * writes nothing. */
  def gatedBatch(write: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit):
      (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    gated(write, (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]) =>
      // drain every partition's iterator: state stores only commit once
      // their iterator is exhausted — an un-consumed iterator reads as
      // "0 commits" to Spark 4's batch commit validation
      b.foreachPartition((it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach(_ => ())))
}

object LeaderGate {
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitorFor(lockFile: Path): Object =
    monitors.computeIfAbsent(
      lockFile.toAbsolutePath.normalize.toString, _ => new Object)
}
