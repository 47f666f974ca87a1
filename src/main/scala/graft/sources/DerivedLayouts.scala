package graft.sources

/** Write-once cache for derived on-disk layouts (partitioned copies,
  * schema-evolution waves) that layout-demonstration queries build from
  * a source table. Keyed by (layout kind, source dir): the first
  * invocation in a JVM pays the write, every later one (interleaved
  * bench passes, Verify + Smoke in one JVM) reuses the same directory
  * instead of accumulating an unbounded pile of full table copies in
  * /tmp. This also matches the queries' stated cost model — "layout is
  * paid once; every later read pays only for what it prunes". */
object DerivedLayouts {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize `write(path)` under a fresh temp dir the first time
    * `key` is seen; return the memoized path afterwards. The write runs
    * at most once per key (computeIfAbsent's per-key lock). */
  def once(key: String)(write: String => Unit): String =
    cache.computeIfAbsent(key, { _ =>
      val base = java.nio.file.Files.createTempDirectory(
        "graft_" + key.replaceAll("[^A-Za-z0-9]+", "_")).toString
      write(base)
      base
    })
}
