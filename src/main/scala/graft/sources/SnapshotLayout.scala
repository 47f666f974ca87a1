package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The append-only versioned documents layout shared by q53 (path-level
  * snapshot reads) and the graft TableCatalog's `VERSION AS OF` time
  * travel (q63): v1 is yesterday's crawl (doc_id%10 != 7), the v2 delta
  * backfills the rest. v1's files are never rewritten when v2 lands —
  * snapshot isolation by construction. Built once per (JVM, source dir)
  * via DerivedLayouts; both consumers share the artifact, so the catalog
  * and the hand-assembled multi-path read are provably over the SAME
  * bytes. */
object SnapshotLayout {
  def ensure(s: SparkSession, dir: String): String =
    DerivedLayouts.once(s"snap|$dir") { path =>
      val docs = Tables.documents(s, dir)
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        .write.parquet(s"$path/v1")
      docs.filter(pmod(col("doc_id"), lit(10)) === 7)
        .write.parquet(s"$path/v2")
    }

  /** Paths making up snapshot `version` (cumulative deltas ≤ version). */
  def pathsAsOf(base: String, version: Int): Seq[String] =
    (1 to version).map(v => s"$base/v$v")
}
