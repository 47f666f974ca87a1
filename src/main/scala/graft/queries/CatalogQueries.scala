package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog & connector-governance coverage (SURVEY §2, q63+): the
  * engine-extension faces a real deployment wires up LAST — named
  * tables, named functions, and connector DML — after the per-query
  * path-string surface works. Everything here is SESSION-ISOLATED (the
  * q60 pattern: `newSession()` + per-session catalog conf) so a catalog
  * registration never silently changes another key's resolution or
  * plan gates.
  *
  * Scale shapes: the catalog resolves names to the SAME parquet
  * FileTable scans the path queries plan (pushdown/pruning identical,
  * PlanSpec-gated); the V2 functions dispatch through codegen'd Invoke
  * onto the repo's native kernels (zero ScalaUDF); the mem-table DML
  * protocol is the single-JVM twin of what a lakehouse table format
  * implements — the POINT is the CREATE/INSERT/DELETE protocol
  * (commit-message exactly-once, predicate-vetted deletes), which is
  * identical on a 1000-executor cluster. */
object CatalogQueries {

  private def catalogSession(s0: SparkSession, dir: String): SparkSession = {
    val s = s0.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.dir", dir)
    s
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TableCatalog plugin (the named-table surface): corpus tables
    // resolve as graft.corpus.<name> from PURE SQL, and snapshot
    // selection is SQL time travel — VERSION AS OF v resolves through
    // loadTable(ident, version) to the append-only SnapshotLayout (the
    // SAME artifact q53 reads by hand-assembled path list). Legs: the
    // two snapshots (v1 = yesterday's crawl doc_id%10!=7, v2 = +
    // backfill delta), a predicate-pushdown leg (lang filter reaches
    // the parquet scan through the catalog — PlanSpec proves identical
    // PushedFilters to the path scan, and that the plan carries the
    // catalog identifier), and a cross-table join leg (documents ⋈
    // embeddings, both catalog-resolved).
    "q63_table_catalog" -> { (s0, dir) =>
      val s = catalogSession(s0, dir)
      // build the versioned layout before analysis resolves VERSION AS OF
      graft.sources.SnapshotLayout.ensure(s, dir)
      s.sql("""
        SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_rows, sum(n_chars) AS mass
        FROM graft.corpus.documents VERSION AS OF 1
        UNION ALL
        SELECT 2, CAST(count(*) AS BIGINT), sum(n_chars)
        FROM graft.corpus.documents VERSION AS OF 2
        UNION ALL
        SELECT 3, CAST(count(*) AS BIGINT), sum(n_chars)
        FROM graft.corpus.documents WHERE lang = 'en'
        UNION ALL
        SELECT 4, CAST(count(*) AS BIGINT), sum(CAST(e.label AS BIGINT))
        FROM graft.corpus.documents d
        JOIN graft.corpus.embeddings e ON d.doc_id = e.vec_id
        ORDER BY leg""")
    },

    // V2 FunctionCatalog + ScalarFunction magic-method codegen (q59
    // covered DECLARATIVE SQL UDFs; this is the compiled-native row):
    // the repo's kernels — token_count, cosine, hamming — callable by
    // NAME from pure SQL as graft.fn.*, resolved to codegen'd Invoke
    // expressions on the same static kernels the DataFrame-API native
    // expressions use (PlanSpec: zero ScalaUDF, zero
    // ApplyFunctionExpression row-boxing fallback). round(cos, 6) is
    // the proven cross-engine finish (s1 family).
    "q64_fn_catalog" -> { (s0, dir) =>
      val s = catalogSession(s0, dir)
      s.sql("""
        SELECT d.doc_id,
          graft.fn.token_count(d.text) AS n_tokens,
          round(graft.fn.cosine_sim(e1.embedding, e2.embedding), 6) AS sim_next,
          graft.fn.hamming64(d.doc_id * 2654435761, d.doc_id * 40503,
                             d.doc_id * 2654435761 + d.doc_id % 7,
                             d.doc_id * 40503) AS ham
        FROM graft.corpus.documents d
        JOIN graft.corpus.embeddings e1 ON e1.vec_id = d.doc_id
        JOIN graft.corpus.embeddings e2 ON e2.vec_id = d.doc_id + 1
        WHERE d.doc_id % 10 = 0
        ORDER BY d.doc_id""")
    },

    // Connector ROW-LEVEL DELETE — the DML face of the connector matrix
    // (read q51, write q52, stream st19/st20, pushdown q58/q61/q62):
    // full lifecycle through the catalog — CREATE TABLE graft.mem.*,
    // INSERT INTO from the metrics feed (commit-message exactly-once,
    // the q52 protocol), then DELETE FROM through SupportsDeleteV2:
    // Spark translates the WHERE into a V2 predicate tree,
    // canDeleteWhere vets that EVERY predicate is evaluable (soundness
    // over coverage — a partial match would delete wrong rows; the
    // rejection path is spec-pinned), deleteWhere applies them in one
    // atomic swap. Output: the surviving rows' per-kind accounting —
    // closed-form from the feed formulas, so a delete that dropped too
    // much, too little, or double-applied breaks the hash.
    "q67_connector_delete" -> { (s0, _) =>
      val s = catalogSession(s0, "")
      s.sql("DROP TABLE IF EXISTS graft.mem.metrics67")
      s.sql("CREATE TABLE graft.mem.metrics67 " +
        "(id BIGINT, node STRING, kind STRING, value BIGINT)")
      s.read.format("graft.sources.MetricsFeedSource")
        .option("rows", "100000").option("partitions", "8").load()
        .createOrReplaceTempView("v67_feed")
      s.sql("INSERT INTO graft.mem.metrics67 " +
        "SELECT id, node, kind, value FROM v67_feed")
      s.sql("DELETE FROM graft.mem.metrics67 " +
        "WHERE kind = 'timer' OR id >= 90000")
      s.sql("""
        SELECT kind, CAST(count(*) AS BIGINT) AS n, sum(value) AS sum_value,
          min(id) AS min_id, max(id) AS max_id
        FROM graft.mem.metrics67
        GROUP BY kind ORDER BY kind""")
    }
  )

  val oracles: Map[String, String] = Map(

    "q63_table_catalog" ->
      """SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS mass
        |FROM documents WHERE doc_id % 10 <> 7
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE lang = 'en'
        |UNION ALL
        |SELECT 4, CAST(count(*) AS BIGINT), CAST(sum(CAST(e.label AS BIGINT)) AS BIGINT)
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY leg""".stripMargin,

    "q64_fn_catalog" ->
      """WITH v AS (SELECT vec_id, embedding AS e,
        |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
        |  FROM embeddings)
        |SELECT d.doc_id,
        |  CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+')) AS INT) AS n_tokens,
        |  round(list_sum(list_transform(generate_series(1, len(a.e)), i ->
        |    CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE))) / sqrt(a.n2 * b.n2), 6) AS sim_next,
        |  CAST(bit_count(xor(d.doc_id * 2654435761, d.doc_id * 2654435761 + d.doc_id % 7)) AS INT) AS ham
        |FROM documents d
        |JOIN v a ON a.vec_id = d.doc_id
        |JOIN v b ON b.vec_id = d.doc_id + 1
        |WHERE d.doc_id % 10 = 0
        |ORDER BY d.doc_id""".stripMargin,

    "q67_connector_delete" ->
      """SELECT kind, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value) AS BIGINT) AS sum_value,
        |  min(id) AS min_id, max(id) AS max_id
        |FROM (
        |  SELECT id,
        |    CASE CAST(id % 3 AS INT) WHEN 0 THEN 'gauge'
        |      WHEN 1 THEN 'counter' ELSE 'timer' END AS kind,
        |    (id * 2654435761) % 100000 AS value
        |  FROM range(0, 100000) t(id)) u
        |WHERE NOT (kind = 'timer' OR id >= 90000)
        |GROUP BY kind ORDER BY kind""".stripMargin
  )
}
