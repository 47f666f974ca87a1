package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.MemTables
import graft.sources.{SnapshotLayout, Tables}

/** Gates for the graft catalog plugin (q63/q64/q67): time-travel
  * equivalence with the path-level snapshot read, the mem-table DML
  * lifecycle, the canDeleteWhere soundness veto, and function-catalog
  * bind validation. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  val sf = "/root/testdata/sf0.001"

  private def cataloged() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.dir", sf)
    s
  }

  test("VERSION AS OF v reads the SAME bytes as the path-level snapshot layout (q53 parity)") {
    val s = cataloged()
    val base = SnapshotLayout.ensure(s, sf)
    def digest(df: org.apache.spark.sql.DataFrame): String =
      df.select(md5(concat_ws("|", col("doc_id"), col("text"))).as("h"))
        .agg(md5(concat_ws("", sort_array(collect_list(col("h"))))).as("d"))
        .collect()(0).getString(0)
    val v1Cat = s.sql("SELECT doc_id, text FROM graft.corpus.documents VERSION AS OF 1")
    val v1Path = s.read.parquet(s"$base/v1").select(col("doc_id"), col("text"))
    assert(digest(v1Cat) == digest(v1Path))
    // snapshot 2 is cumulative: v1 + the backfill delta == the full corpus
    val v2Cat = s.sql("SELECT doc_id, text FROM graft.corpus.documents VERSION AS OF 2")
    assert(digest(v2Cat) == digest(
      Tables.documents(s, sf).select(col("doc_id"), col("text"))))
    // and an unknown version is an analysis error, not a silent full read
    intercept[Exception] {
      s.sql("SELECT count(*) FROM graft.corpus.documents VERSION AS OF 9").collect()
    }
  }

  test("mem-table DML lifecycle: CREATE, INSERT (commit-message append), DELETE, OVERWRITE truncate") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_t")
    s.sql("CREATE TABLE graft.mem.spec_t (id BIGINT, kind STRING, value BIGINT)")
    s.sql("INSERT INTO graft.mem.spec_t VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'a', 30), (4, 'c', 40), (5, NULL, 50)")
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_t").collect()(0).getLong(0) == 5)
    // compound predicate: OR of an equality and a range — both vetted,
    // both applied; the NULL kind row survives kind='a' (SQL three-valued
    // semantics: NULL comparison is not-true, DELETE keeps the row)
    s.sql("DELETE FROM graft.mem.spec_t WHERE kind = 'a' OR id >= 4")
    val left = s.sql("SELECT id FROM graft.mem.spec_t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(left == Seq(2L))
    // IN + IS NULL leaves
    s.sql("INSERT INTO graft.mem.spec_t VALUES (6, NULL, 60), (7, 'd', 70)")
    s.sql("DELETE FROM graft.mem.spec_t WHERE kind IS NULL OR id IN (7)")
    assert(s.sql("SELECT id FROM graft.mem.spec_t").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // INSERT OVERWRITE goes through SupportsTruncate: old rows vanish
    s.sql("INSERT OVERWRITE graft.mem.spec_t VALUES (9, 'z', 90)")
    val all = s.sql("SELECT id, kind, value FROM graft.mem.spec_t").collect()
    assert(all.length == 1 && all(0).getLong(0) == 9L)
    s.sql("DROP TABLE graft.mem.spec_t")
    assert(MemTables.get("spec_t").isEmpty)
  }

  test("canDeleteWhere soundness veto: a translatable-but-unsupported predicate REFUSES, rows intact") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_v")
    s.sql("CREATE TABLE graft.mem.spec_v (id BIGINT, node STRING)")
    s.sql("INSERT INTO graft.mem.spec_v VALUES (1, 'node1'), (2, 'node2')")
    // LIKE 'node1%' translates to a STARTS_WITH V2 predicate, which the
    // mem interpreter does not evaluate — canDeleteWhere must veto the
    // whole delete (partial evaluation would delete the wrong rows)
    val e = intercept[Exception] {
      s.sql("DELETE FROM graft.mem.spec_v WHERE node LIKE 'node1%'")
    }
    assert(e.getMessage != null)
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_v").collect()(0).getLong(0) == 2,
      "a vetoed delete must leave the table untouched")
    s.sql("DROP TABLE graft.mem.spec_v")
  }

  test("function catalog: bind rejects wrong arity/types as an analysis error") {
    val s = cataloged()
    intercept[Exception] {
      s.sql("SELECT graft.fn.cosine_sim(1, 2)").collect()
    }
    intercept[Exception] {
      s.sql("SELECT graft.fn.hamming64(1, 2)").collect() // arity 2, wants 4
    }
    intercept[Exception] {
      s.sql("SELECT graft.fn.no_such_fn(1)").collect()
    }
    // and the happy path computes the same value as the native kernel
    val r = s.sql("SELECT graft.fn.hamming64(5, 0, 6, 0) AS h").collect()(0).getInt(0)
    assert(r == java.lang.Long.bitCount(5L ^ 6L))
  }

  test("catalog surface: listings and read-only guards") {
    val s = cataloged()
    val ns = s.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
    assert(ns.contains("corpus") && ns.contains("mem"))
    val tabs = s.sql("SHOW TABLES IN graft.corpus").collect().map(_.getString(1)).toSet
    assert(tabs.contains("documents") && tabs.contains("lineitem"))
    // corpus namespace is read-only: CREATE there must fail
    intercept[Exception] {
      s.sql("CREATE TABLE graft.corpus.extra (x BIGINT)")
    }
  }
}
