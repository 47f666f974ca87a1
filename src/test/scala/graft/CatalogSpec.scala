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

  test("canDeleteWhere veto ESCALATES: an unsupported predicate falls back to the group rewrite and deletes exactly") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_v")
    s.sql("CREATE TABLE graft.mem.spec_v (id BIGINT, node STRING)")
    s.sql("INSERT INTO graft.mem.spec_v VALUES (1, 'node1'), (2, 'node2')")
    // LIKE 'node1%' translates to a STARTS_WITH V2 predicate, which the
    // metadata path's interpreter does not evaluate — canDeleteWhere
    // vetoes (partial evaluation would delete wrong rows), and Spark
    // falls back to the GROUP-BASED row-level rewrite, which evaluates
    // the predicate itself and replaces the group. Soundness preserved,
    // coverage gained: both DML faces on one table, dispatched by
    // predicate evaluability.
    graft.catalog.MemTables.lastRowLevelCommand = ""
    s.sql("DELETE FROM graft.mem.spec_v WHERE node LIKE 'node1%'")
    assert(graft.catalog.MemTables.lastRowLevelCommand == "DELETE",
      "the vetoed metadata delete must have escalated to the row-level rewrite")
    val left = s.sql("SELECT id, node FROM graft.mem.spec_v").collect()
    assert(left.length == 1 && left(0).getLong(0) == 2L &&
      left(0).getString(1) == "node2", left.mkString(","))
    // an EVALUABLE predicate still takes the cheap metadata path — no
    // rewrite command recorded
    s.sql("INSERT INTO graft.mem.spec_v VALUES (3, 'node3')")
    graft.catalog.MemTables.lastRowLevelCommand = ""
    s.sql("DELETE FROM graft.mem.spec_v WHERE id = 3")
    assert(graft.catalog.MemTables.lastRowLevelCommand == "",
      "an evaluable delete must stay on the metadata deleteWhere path")
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_v").collect()(0).getLong(0) == 1)
    s.sql("DROP TABLE graft.mem.spec_v")
  }

  test("q71: UPDATE and MERGE go through the group-based rewrite — one atomic ReplaceData commit each") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_u")
    s.sql("CREATE TABLE graft.mem.spec_u (id BIGINT, v BIGINT)")
    s.sql("INSERT INTO graft.mem.spec_u VALUES (1, 10), (2, 20), (3, 30)")
    graft.catalog.MemTables.lastRowLevelCommand = ""
    val upd = s.sql("UPDATE graft.mem.spec_u SET v = v + 1 WHERE id >= 2")
    assert(graft.catalog.MemTables.lastRowLevelCommand == "UPDATE")
    // the UPDATE plan is the group rewrite: ReplaceData, not a metadata op
    assert(upd.queryExecution.executedPlan.toString.contains("ReplaceData") ||
      upd.queryExecution.logical.toString.contains("ReplaceData"),
      upd.queryExecution.logical.toString)
    val after = s.sql("SELECT id, v FROM graft.mem.spec_u ORDER BY id").collect()
    assert(after.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 21L), (3L, 31L)))
    // MERGE: matched update + unmatched insert in ONE commit
    s.sql("SELECT * FROM VALUES (3, 300), (4, 400) AS t(id, v)")
      .createOrReplaceTempView("spec_u_src")
    graft.catalog.MemTables.lastRowLevelCommand = ""
    s.sql("""MERGE INTO graft.mem.spec_u t USING spec_u_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    assert(graft.catalog.MemTables.lastRowLevelCommand == "MERGE")
    val merged = s.sql("SELECT id, v FROM graft.mem.spec_u ORDER BY id").collect()
    assert(merged.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 21L), (3L, 300L), (4L, 400L)))
    s.sql("DROP TABLE graft.mem.spec_u")
  }

  test("q79: merge-on-read table plans WriteDelta — per-op counts in commit messages, delta-DELETE fallback, CoW equivalence") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_d")
    // rowId must be NOT NULL (NULLABLE_ROW_ID_ATTRIBUTES otherwise)
    s.sql("CREATE TABLE graft.mem.spec_d (id BIGINT NOT NULL, v BIGINT) " +
      "TBLPROPERTIES ('write.mode'='merge-on-read')")
    s.sql("INSERT INTO graft.mem.spec_d VALUES (1, 10), (2, 20), (3, 30)")
    MemTables.lastRowLevelCommand = ""
    val upd = s.sql("UPDATE graft.mem.spec_d SET v = v + 1 WHERE id >= 2")
    // the plan is WriteDelta, NOT the copy-on-write ReplaceData
    val updPlan = upd.queryExecution.logical.toString +
      upd.queryExecution.executedPlan.toString
    assert(updPlan.contains("WriteDelta") && !updPlan.contains("ReplaceData"),
      updPlan)
    assert(MemTables.lastRowLevelCommand == "DELTA:UPDATE")
    // O(changed rows): 2 update deltas, row 1 never crossed the write
    assert(MemTables.lastDeltaCounts == ((0L, 2L, 0L)), MemTables.lastDeltaCounts)
    assert(s.sql("SELECT id, v FROM graft.mem.spec_d ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 21L), (3L, 31L)))
    // MERGE: 1 matched update + 1 unmatched insert in ONE delta commit
    s.sql("SELECT * FROM VALUES (3, 300), (4, 400) AS t(id, v)")
      .createOrReplaceTempView("spec_d_src")
    MemTables.lastRowLevelCommand = ""
    s.sql("""MERGE INTO graft.mem.spec_d t USING spec_d_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    assert(MemTables.lastRowLevelCommand == "DELTA:MERGE")
    assert(MemTables.lastDeltaCounts == ((1L, 1L, 0L)), MemTables.lastDeltaCounts)
    // the final content matches the IDENTICAL lifecycle run
    // copy-on-write in the q71 test above — same answer, different
    // write protocol
    assert(s.sql("SELECT id, v FROM graft.mem.spec_d ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 21L), (3L, 300L), (4L, 400L)))
    // a DELETE the metadata path vetoes (arithmetic leaf) falls back to
    // the row-level rewrite — on THIS table that's a delta of delete
    // ops, not a group rewrite
    MemTables.lastRowLevelCommand = ""
    s.sql("DELETE FROM graft.mem.spec_d WHERE v % 2 = 1")
    assert(MemTables.lastRowLevelCommand == "DELTA:DELETE")
    // rows are (1,10),(2,21),(3,300),(4,400) — only v=21 is odd
    assert(MemTables.lastDeltaCounts == ((0L, 0L, 1L)), MemTables.lastDeltaCounts)
    assert(s.sql("SELECT id FROM graft.mem.spec_d ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    // an EVALUABLE delete still takes the cheap metadata path
    MemTables.lastRowLevelCommand = ""
    s.sql("DELETE FROM graft.mem.spec_d WHERE id = 1")
    assert(MemTables.lastRowLevelCommand == "")
    s.sql("DROP TABLE graft.mem.spec_d")
  }

  test("q80: staged CTAS/RTAS is commit-or-vanish — a mid-write failure leaves the catalog untouched") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_s")
    // failed CTAS: the query dies mid-write, commitStagedChanges never
    // runs → NO half-table (the non-atomic createTable would have left
    // an empty shell)
    intercept[Exception] {
      s.sql("CREATE TABLE graft.mem.spec_s AS SELECT id, " +
        "CASE WHEN id = 7 THEN raise_error('boom') " +
        "ELSE CAST(id AS STRING) END AS v FROM range(0, 10)")
    }
    assert(MemTables.get("spec_s").isEmpty, "failed CTAS must leave NO table")
    // successful CTAS is immediately queryable
    s.sql("CREATE TABLE graft.mem.spec_s AS " +
      "SELECT id, CAST(id AS STRING) AS v FROM range(0, 5)")
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_s")
      .collect()(0).getLong(0) == 5)
    // failed REPLACE: the OLD table survives untouched
    intercept[Exception] {
      s.sql("REPLACE TABLE graft.mem.spec_s AS SELECT id, " +
        "CASE WHEN id = 3 THEN raise_error('boom') " +
        "ELSE CAST(id AS STRING) END AS v FROM range(0, 10)")
    }
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_s")
      .collect()(0).getLong(0) == 5, "failed RTAS must keep the old table")
    // successful REPLACE swaps in one atomic registry operation
    s.sql("REPLACE TABLE graft.mem.spec_s AS " +
      "SELECT id, CAST(id * 2 AS STRING) AS v FROM range(0, 3)")
    val swapped = s.sql("SELECT id, v FROM graft.mem.spec_s ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(swapped == Seq((0L, "0"), (1L, "2"), (2L, "4")))
    // stage-time existence checks: CREATE of an existing table and
    // REPLACE of a missing one are rejected before any write runs
    intercept[Exception] {
      s.sql("CREATE TABLE graft.mem.spec_s AS SELECT 1 AS id") }
    intercept[Exception] {
      s.sql("REPLACE TABLE graft.mem.spec_nope AS SELECT 1 AS id") }
    s.sql("DROP TABLE graft.mem.spec_s")
  }

  test("q81: partitioned mem table — scoped INSERT OVERWRITE replaces ONE partition, others survive; DDL guards") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_p")
    s.sql("CREATE TABLE graft.mem.spec_p (id BIGINT, day STRING, v BIGINT) " +
      "PARTITIONED BY (day)")
    // partitioning is REPORTED (identity transform on day)
    assert(MemTables.get("spec_p").get.partitionCols == Seq("day"))
    s.sql("INSERT INTO graft.mem.spec_p VALUES " +
      "(1, 'd1', 10), (2, 'd1', 20), (3, 'd2', 30), (4, 'd3', 40)")
    // re-ingest day d1 corrected — d2/d3 must SURVIVE
    s.sql("INSERT OVERWRITE graft.mem.spec_p PARTITION (day = 'd1') " +
      "VALUES (1, 11), (2, 21), (9, 91)")
    val after = s.sql("SELECT id, day, v FROM graft.mem.spec_p ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(after == Seq((1L, "d1", 11L), (2L, "d1", 21L), (3L, "d2", 30L),
      (4L, "d3", 40L), (9L, "d1", 91L)), after)
    // plain INSERT OVERWRITE = truncate (overwrite ALWAYS_TRUE)
    s.sql("INSERT OVERWRITE graft.mem.spec_p VALUES (7, 'd9', 70)")
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_p")
      .collect()(0).getLong(0) == 1)
    // partition-column DDL is guarded: rename/drop would orphan the
    // declared partitioning
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_p RENAME COLUMN day TO dt") }
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_p DROP COLUMN day") }
    // non-identity transforms are rejected loudly at CREATE
    intercept[Exception] {
      s.sql("CREATE TABLE graft.mem.spec_pb (id BIGINT, v BIGINT) " +
        "PARTITIONED BY (bucket(4, id))") }
    // partitioned CTAS routes through the staged path and publishes
    // WITH its partitioning — scoped overwrite works on the result
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_pc")
    s.sql("CREATE TABLE graft.mem.spec_pc PARTITIONED BY (day) AS " +
      "SELECT id, CASE WHEN id < 2 THEN 'd1' ELSE 'd2' END AS day " +
      "FROM range(0, 4)")
    assert(MemTables.get("spec_pc").get.partitionCols == Seq("day"))
    s.sql("INSERT OVERWRITE graft.mem.spec_pc PARTITION (day = 'd1') " +
      "VALUES (9)")
    val pc = s.sql("SELECT id, day FROM graft.mem.spec_pc ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(pc == Seq((2L, "d2"), (3L, "d2"), (9L, "d1")), pc)
    s.sql("DROP TABLE graft.mem.spec_pc")
    s.sql("DROP TABLE graft.mem.spec_p")
  }

  test("q82: identity columns — writer-side assignment off the table sequence; ALWAYS rejects explicit, BY DEFAULT allows") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_i")
    s.sql("CREATE TABLE graft.mem.spec_i (rid BIGINT GENERATED ALWAYS AS " +
      "IDENTITY (START WITH 10 INCREMENT BY 5), v STRING)")
    s.sql("INSERT INTO graft.mem.spec_i (v) VALUES ('a'), ('b')")
    // a SECOND insert continues the sequence — the high-water mark is
    // table state, not per-command
    s.sql("INSERT INTO graft.mem.spec_i (v) VALUES ('c')")
    val got = s.sql("SELECT rid, v FROM graft.mem.spec_i ORDER BY rid")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((10L, "a"), (15L, "b"), (20L, "c")), got)
    // GENERATED ALWAYS: an explicit value is rejected BY THE CONNECTOR
    // (the analyzer passes it through — probed) and the q52 commit
    // protocol keeps the store untouched
    intercept[Exception] {
      s.sql("INSERT INTO graft.mem.spec_i VALUES (999, 'x')") }
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_i")
      .collect()(0).getLong(0) == 3)
    // GENERATED BY DEFAULT: explicit values pass through AND advance
    // the high-water mark past themselves (SYNC IDENTITY at commit), so
    // a later generated id lands on the first lattice point beyond the
    // explicit value instead of colliding with it
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_i2")
    s.sql("CREATE TABLE graft.mem.spec_i2 (rid BIGINT GENERATED BY DEFAULT " +
      "AS IDENTITY, v STRING)")
    s.sql("INSERT INTO graft.mem.spec_i2 VALUES (100, 'x')")
    s.sql("INSERT INTO graft.mem.spec_i2 (v) VALUES ('y')")
    val byDef = s.sql("SELECT rid, v FROM graft.mem.spec_i2 ORDER BY rid")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(byDef == Seq((100L, "x"), (101L, "y")), byDef)
    // an explicit value BELOW the mark does not regress the sequence
    s.sql("INSERT INTO graft.mem.spec_i2 VALUES (50, 'z')")
    s.sql("INSERT INTO graft.mem.spec_i2 (v) VALUES ('w')")
    val afterLow = s.sql("SELECT rid FROM graft.mem.spec_i2 ORDER BY rid")
      .collect().map(_.getLong(0)).toSeq
    assert(afterLow == Seq(50L, 100L, 101L, 102L), afterLow)
    // DDL guards: renaming/dropping the identity column would leave a
    // dangling IdentitySpec (and crash every later INSERT)
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_i2 RENAME COLUMN rid TO r2") }
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_i2 DROP COLUMN rid") }
    s.sql("DROP TABLE graft.mem.spec_i")
    s.sql("DROP TABLE graft.mem.spec_i2")
  }

  test("q82×q79: identity on merge-on-read — MERGE inserts draw from the sequence; CoW identity tables reject row-level commands") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_i3")
    s.sql("CREATE TABLE graft.mem.spec_i3 (id BIGINT NOT NULL, v BIGINT, " +
      "rid BIGINT GENERATED BY DEFAULT AS IDENTITY) " +
      "TBLPROPERTIES ('write.mode'='merge-on-read')")
    s.sql("INSERT INTO graft.mem.spec_i3 (id, v) VALUES (1, 10), (2, 20)")
    s.sql("SELECT * FROM VALUES (2, 200), (3, 300) AS t(id, v)")
      .createOrReplaceTempView("spec_i3_src")
    s.sql("""MERGE INTO graft.mem.spec_i3 t USING spec_i3_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    val got = s.sql("SELECT id, v, rid FROM graft.mem.spec_i3 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // merge-UPDATED row keeps its rid (pass-through); merge-INSERTED
    // row drew the next sequence value (3)
    assert(got == Seq((1L, 10L, 1L), (2L, 200L, 2L), (3L, 300L, 3L)), got)
    // copy-on-write identity tables reject UPDATE/MERGE loudly: the
    // group rewrite cannot tell pass-through identities from inserts
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_i4")
    s.sql("CREATE TABLE graft.mem.spec_i4 (id BIGINT, " +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY)")
    s.sql("INSERT INTO graft.mem.spec_i4 (id) VALUES (7)")
    val e = intercept[Exception] {
      s.sql("UPDATE graft.mem.spec_i4 SET id = 5 WHERE id = 7") }
    assert(e.getMessage != null &&
      e.toString.contains("merge-on-read"), e.toString)
    s.sql("DROP TABLE graft.mem.spec_i3")
    s.sql("DROP TABLE graft.mem.spec_i4")
  }

  test("q89: secondary index — zone-map block skip is sound and maintained; DDL error paths; column guards") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_ix")
    s.sql("CREATE TABLE graft.mem.spec_ix (id BIGINT, v BIGINT)")
    // 8192 clustered rows = 8 blocks of 1024
    s.sql("SELECT id, id * 7 AS v FROM range(0, 8192)")
      .createOrReplaceTempView("spec_ix_src")
    s.sql("INSERT INTO graft.mem.spec_ix SELECT id, v FROM spec_ix_src ORDER BY id")
    s.sql("CREATE INDEX spec_idx ON graft.mem.spec_ix (id)")
    def probe() = s.sql("SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS sv " +
      "FROM graft.mem.spec_ix WHERE id BETWEEN 2048 AND 4095")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    MemTables.lastIndexSkip = ""
    val withIx = probe()
    // the BETWEEN [2048, 4095] probe covers exactly blocks 2..3 of 8
    assert(MemTables.lastIndexSkip == "blocks=2/8", MemTables.lastIndexSkip)
    assert(withIx == Seq((2048L, (2048L until 4096L).map(_ * 7).sum)), withIx)
    // the index changes COST, never ANSWERS: drop it, same rows
    s.sql("DROP INDEX spec_idx ON graft.mem.spec_ix")
    MemTables.lastIndexSkip = ""
    assert(probe() == withIx)
    assert(MemTables.lastIndexSkip == "", "dropped index still hinted")
    // maintenance: recreate, DELETE compacts the store, zones refresh —
    // the probe stays correct on the SHIFTED block layout
    s.sql("CREATE INDEX spec_idx ON graft.mem.spec_ix (id)")
    s.sql("DELETE FROM graft.mem.spec_ix WHERE id < 1000")
    assert(probe() == withIx, "zones stale after DELETE")
    // DDL error paths
    intercept[Exception] {
      s.sql("CREATE INDEX spec_idx ON graft.mem.spec_ix (v)") }
    intercept[Exception] {
      s.sql("DROP INDEX nope ON graft.mem.spec_ix") }
    // an indexed column can be neither renamed nor dropped (dangling
    // specs + dead zone maps) — same posture as identity columns
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_ix RENAME COLUMN id TO id2") }
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_ix DROP COLUMN id") }
    s.sql("DROP TABLE graft.mem.spec_ix")
  }

  test("q86: partition DDL — registry-backed SHOW/ADD/DROP/RENAME/TRUNCATE, atomic all-or-nothing, error paths") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_p86")
    s.sql("CREATE TABLE graft.mem.spec_p86 (id BIGINT, day BIGINT) " +
      "PARTITIONED BY (day)")
    def parts = s.sql("SHOW PARTITIONS graft.mem.spec_p86")
      .collect().map(_.getString(0)).sorted.toSeq
    def ids = s.sql("SELECT id FROM graft.mem.spec_p86 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    // writes auto-register the partitions they touch
    s.sql("INSERT INTO graft.mem.spec_p86 VALUES (1, 10), (2, 20)")
    assert(parts == Seq("day=10", "day=20"), parts)
    // ADD registers an empty partition that lists before any row lands
    s.sql("ALTER TABLE graft.mem.spec_p86 ADD PARTITION (day = 30)")
    assert(parts == Seq("day=10", "day=20", "day=30"), parts)
    // add-existing is an error...
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_p86 ADD PARTITION (day = 10)") }
    // ...and the ATOMIC contract makes a multi-add all-or-nothing: one
    // existing ident fails the whole call before any registry change
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_p86 " +
        "ADD PARTITION (day = 40) PARTITION (day = 10)") }
    assert(!parts.contains("day=40"), parts)
    // IF NOT EXISTS tolerates
    s.sql("ALTER TABLE graft.mem.spec_p86 ADD IF NOT EXISTS PARTITION (day = 10)")
    // DROP removes the partition's DATA with it
    s.sql("ALTER TABLE graft.mem.spec_p86 DROP PARTITION (day = 10)")
    assert(parts == Seq("day=20", "day=30"), parts)
    assert(ids == Seq(2L), ids)
    // drop-missing is an error (IF EXISTS tolerates)
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_p86 DROP PARTITION (day = 99)") }
    s.sql("ALTER TABLE graft.mem.spec_p86 DROP IF EXISTS PARTITION (day = 99)")
    // RENAME moves registry entry AND rewrites the rows' partition column
    s.sql("ALTER TABLE graft.mem.spec_p86 PARTITION (day = 20) " +
      "RENAME TO PARTITION (day = 25)")
    assert(parts == Seq("day=25", "day=30"), parts)
    assert(s.sql("SELECT day FROM graft.mem.spec_p86 WHERE id = 2")
      .collect()(0).getLong(0) == 25L)
    // rename onto an existing partition is rejected
    intercept[Exception] {
      s.sql("ALTER TABLE graft.mem.spec_p86 PARTITION (day = 25) " +
        "RENAME TO PARTITION (day = 30)") }
    // TRUNCATE empties the rows but the partition stays listed
    s.sql("TRUNCATE TABLE graft.mem.spec_p86 PARTITION (day = 25)")
    assert(ids == Seq.empty, ids)
    assert(parts == Seq("day=25", "day=30"), parts)
    // unpartitioned mem tables do NOT expose the partition-DDL face
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_p86u")
    s.sql("CREATE TABLE graft.mem.spec_p86u (id BIGINT)")
    intercept[Exception] { s.sql("SHOW PARTITIONS graft.mem.spec_p86u") }
    s.sql("DROP TABLE graft.mem.spec_p86")
    s.sql("DROP TABLE graft.mem.spec_p86u")
  }

  test("q84: CALL procedure — summary rows via LocalScan, store sorted, unknown procedure rejected") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_c")
    s.sql("CREATE TABLE graft.mem.spec_c (id BIGINT, v BIGINT)")
    s.sql("INSERT INTO graft.mem.spec_c VALUES (5, 50), (1, 10), (3, 30)")
    // the CALL's resultset is the procedure's LocalScan summary row
    val r = s.sql("CALL graft.sys.compact(table => 'spec_c')").collect()
    assert(r.length == 1 && r(0).getString(0) == "spec_c" &&
      r(0).getLong(1) == 3L, r.mkString(","))
    // the store is now id-sorted: _pos tracks id rank
    val pos = s.sql("SELECT _pos, id FROM graft.mem.spec_c ORDER BY _pos")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(pos == Seq((0L, 1L), (1L, 3L), (2L, 5L)), pos)
    // SHOW PROCEDURES surfaces the namespace inventory
    val shown = s.sql("SHOW PROCEDURES IN graft.sys").collect()
      .map(_.getAs[String]("procedure_name")).toSeq
    assert(shown == Seq("compact"), shown)
    // unknown procedure / positional misuse fail loudly
    intercept[Exception] { s.sql("CALL graft.sys.nope()").collect() }
    intercept[Exception] {
      s.sql("CALL graft.sys.compact(table => 'no_such_table')").collect() }
    s.sql("DROP TABLE graft.mem.spec_c")
  }

  test("q72: _pos metadata column — hidden from SELECT *, addressable by name, positions compact after DELETE") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_m")
    s.sql("CREATE TABLE graft.mem.spec_m (id BIGINT, v BIGINT)")
    s.sql("INSERT INTO graft.mem.spec_m SELECT id, id * 10 FROM range(0, 6) ORDER BY id")
    // hidden unless requested
    assert(s.sql("SELECT * FROM graft.mem.spec_m").columns.toSeq == Seq("id", "v"))
    // addressable: single-task ordered insert pins _pos == id
    val withPos = s.sql("SELECT _pos, id FROM graft.mem.spec_m ORDER BY id").collect()
    assert(withPos.forall(r => r.getLong(0) == r.getLong(1)), withPos.mkString(","))
    // DELETE compacts the store — positions re-rank densely
    s.sql("DELETE FROM graft.mem.spec_m WHERE id IN (0, 2, 4)")
    val after = s.sql("SELECT _pos, id FROM graft.mem.spec_m ORDER BY id").collect()
    assert(after.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 1L), (1L, 3L), (2L, 5L)), after.mkString(","))
    s.sql("DROP TABLE graft.mem.spec_m")
  }

  test("q76: column DEFAULTs fill analyzer-side — narrow inserts, explicit DEFAULT keyword, provided values never clobbered") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_d")
    s.sql("CREATE TABLE graft.mem.spec_d " +
      "(id BIGINT, kind STRING DEFAULT 'gauge', score BIGINT DEFAULT 100)")
    s.sql("INSERT INTO graft.mem.spec_d (id) VALUES (1)")
    s.sql("INSERT INTO graft.mem.spec_d (id, kind) VALUES (2, DEFAULT)")
    s.sql("INSERT INTO graft.mem.spec_d VALUES (3, 'timer', 7)")
    val rows = s.sql("SELECT id, kind, score FROM graft.mem.spec_d ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "gauge", 100L), (2L, "gauge", 100L),
      (3L, "timer", 7L)), rows.toString)
    s.sql("DROP TABLE graft.mem.spec_d")
  }

  test("q77: CHECK constraint — engine-enforced on write, violating INSERT rejected with the store untouched") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_c")
    s.sql("CREATE TABLE graft.mem.spec_c (id BIGINT, v BIGINT, " +
      "CONSTRAINT v_range CHECK (v >= 0 AND v < 1000))")
    s.sql("INSERT INTO graft.mem.spec_c VALUES (1, 10), (2, 999)")
    // the constraint round-trips through loadTable
    val t = new graft.catalog.GraftCatalog {
      initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    }.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("mem"), "spec_c"))
    assert(t.constraints().exists(_.name() == "v_range"), t.constraints().mkString(","))
    // one bad row fails the WHOLE insert; commit protocol keeps the store intact
    val e = intercept[Exception] {
      s.sql("INSERT INTO graft.mem.spec_c VALUES (3, 500), (4, -5)")
    }
    assert(e.getMessage.contains("CHECK_CONSTRAINT_VIOLATION"), e.getMessage)
    assert(e.getMessage.contains("v_range"), e.getMessage)
    val left = s.sql("SELECT count(*), sum(v) FROM graft.mem.spec_c").collect()(0)
    assert(left.getLong(0) == 2L && left.getLong(1) == 1009L, left.toString)
    s.sql("DROP TABLE graft.mem.spec_c")
  }

  test("q78: ALTER TABLE evolution — ADD COLUMN default materializes, RENAME readdresses, DROP projects; corpus stays immutable") {
    val s = cataloged()
    s.sql("DROP TABLE IF EXISTS graft.mem.spec_a")
    s.sql("CREATE TABLE graft.mem.spec_a (id BIGINT, v BIGINT)")
    s.sql("INSERT INTO graft.mem.spec_a VALUES (1, 10), (2, 20)")
    s.sql("ALTER TABLE graft.mem.spec_a ADD COLUMN tag STRING DEFAULT 'old'")
    s.sql("INSERT INTO graft.mem.spec_a VALUES (3, 30, 'new')")
    // existing rows carry the materialized default; new rows their value
    val tags = s.sql("SELECT id, tag FROM graft.mem.spec_a ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(tags == Seq((1L, "old"), (2L, "old"), (3L, "new")), tags.toString)
    // ...and the narrow insert shape still works post-evolution (the
    // added column's CURRENT_DEFAULT fills analyzer-side)
    s.sql("INSERT INTO graft.mem.spec_a (id, v) VALUES (4, 40)")
    assert(s.sql("SELECT tag FROM graft.mem.spec_a WHERE id = 4")
      .collect()(0).getString(0) == "old")
    s.sql("ALTER TABLE graft.mem.spec_a RENAME COLUMN v TO val")
    assert(s.sql("SELECT sum(val) FROM graft.mem.spec_a").collect()(0).getLong(0) == 100L)
    s.sql("ALTER TABLE graft.mem.spec_a DROP COLUMN tag")
    assert(s.sql("SELECT * FROM graft.mem.spec_a").columns.toSeq == Seq("id", "val"))
    assert(s.sql("SELECT count(*) FROM graft.mem.spec_a").collect()(0).getLong(0) == 4L)
    // corpus tables reject DDL
    intercept[Exception] {
      s.sql("ALTER TABLE graft.corpus.documents ADD COLUMN x BIGINT")
    }
    s.sql("DROP TABLE graft.mem.spec_a")
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
