package graft.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotLayout

/** The graft TableCatalog plugin — the surface every real deployment
  * uses: every earlier query takes a path string; this names them.
  * `spark.sql.catalog.graft = graft.catalog.GraftCatalog` (plus a `dir`
  * option pointing at the corpus layout) makes the corpus addressable as
  * `graft.corpus.documents` etc. from PURE SQL — resolution goes through
  * loadTable, the plan carries the catalog identifier, and the returned
  * table is Spark's own parquet FileTable, so predicate pushdown, column
  * pruning and partition listing are EXACTLY the path-based scan's
  * (PlanSpec-gated: same PushedFilters, identifier present).
  *
  * Three namespaces:
  *  - `corpus`: the test star schema + pipeline tables, read-only named
  *    views of `$dir/<name>.parquet`. `documents` additionally answers
  *    SQL time travel — `VERSION AS OF v` resolves through
  *    loadTable(ident, version) to the append-only SnapshotLayout (the
  *    SAME artifact q53 reads by path): v1 = yesterday's crawl, v2 adds
  *    the backfill delta. Snapshot selection becomes a catalog property
  *    instead of hand-assembled path lists.
  *  - `mem`: writable in-memory tables (MemTables) carrying the DML
  *    protocol — CREATE/INSERT/DELETE (q67).
  *  - `fn` (FunctionCatalog): the native kernels as named SQL functions
  *    with codegen'd magic-method dispatch (q64).
  *
  * Scale: the catalog resolves NAMES, not data — loadTable returns the
  * same FileTable a 1000-executor scan plans from; nothing here touches
  * rows. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with StagingTableCatalog with ProcedureCatalog {

  // ---- stored procedures (q84 — ProcedureCatalog / CALL): the
  // maintenance-op surface; bodies live in GraftProcedures
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("sys")))
      GraftProcedures.names.map(Identifier.of(namespace, _)).toArray
    else Array.empty
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    (if (ident.namespace().sameElements(Array("sys")))
      GraftProcedures.load(ident.name()) else None)
      // Spark 4.1 ships no NoSuchProcedureException; the engine-standard
      // unresolved-routine path is the ROUTINE_NOT_FOUND error class
      // (what DROP/DESCRIBE of a missing routine raises), so CALL on an
      // unknown procedure renders like every other missing routine
      .getOrElse(throw new org.apache.spark.sql.AnalysisException(
        errorClass = "ROUTINE_NOT_FOUND",
        messageParameters = Map("routineName" ->
          (ident.namespace() :+ ident.name()).map(n => s"`$n`").mkString("."))))
  // modern DDL faces the mem tables accept (q76/q77): column DEFAULTs
  // are analyzer-filled from column metadata when this capability is
  // declared; CHECK constraints ride TableInfo into createTable and are
  // engine-enforced on every write
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  // the TableInfo form is the ONLY one that carries constraints — the
  // Column[]/StructType defaults drop them silently
  override def createTable(ident: Identifier, info: TableInfo): Table = {
    if (!ident.namespace().sameElements(Array("mem")))
      throw new UnsupportedOperationException(
        s"only graft.mem tables are writable, got $ident")
    // identity columns ride TableInfo.columns() ONLY — info.schema()
    // strips the spec (probed: empty field metadata), so this is the
    // one place the declaration can be captured
    val identities = info.columns().toSeq
      .flatMap(c => Option(c.identityColumnSpec()).map(sp =>
        MemTables.IdentitySpec(c.name(), sp.getStart, sp.getStep,
          sp.isAllowExplicitInsert)))
    if (identities.length > 1)
      throw new UnsupportedOperationException(
        "mem tables support at most one identity column")
    val partCols = partitionColumns(info.partitions(), info.schema())
    MemTables.create(ident.name(), info.schema(), info.constraints(),
      memProps(info.properties()), partCols, identities.headOption)
    if (partCols.nonEmpty) new MemPartitionedTable(ident.name())
    else new MemTable(ident.name())
  }

  /** Identity-transform partitioning (q81) — the only transform a row
    * store can honor exactly; bucket/days/etc are rejected loudly. */
  private def partitionColumns(partitions: Array[Transform],
      schema: StructType): Seq[String] =
    partitions.toSeq.map {
      case t if t.name() == "identity" && t.references().length == 1 =>
        val c = t.references()(0).fieldNames().mkString(".")
        if (!schema.fieldNames.contains(c))
          throw new IllegalArgumentException(s"no partition column $c")
        c
      case other => throw new UnsupportedOperationException(
        s"mem tables support only identity partitioning, got $other")
    }

  // ---- atomic CTAS / RTAS (q80 — StagingTableCatalog): Spark routes
  // CREATE/REPLACE TABLE AS SELECT through stageCreate/stageReplace,
  // writes INTO the returned StagedTable, and only then calls
  // commitStagedChanges — commit-or-vanish DDL (the staged protocol's
  // Column[] overloads are the ones Spark's defaults funnel into;
  // overriding them covers the TableInfo entry points too).
  private def stage(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String],
      replace: Boolean): StagedTable = {
    if (!ident.namespace().sameElements(Array("mem")))
      throw new UnsupportedOperationException(
        s"only graft.mem tables are writable, got $ident")
    val schema = StructType(columns.map(c =>
      StructField(c.name(), c.dataType(), c.nullable())))
    // partitioned CTAS/RTAS: same identity-transform validation as
    // createTable — the partitioning publishes with the staged table
    new StagedMemTable(ident.name(), schema, memProps(properties), replace,
      partitionColumns(partitions, schema))
  }
  override def stageCreate(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (MemTables.get(ident.name()).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array("mem", ident.name()))
    stage(ident, columns, partitions, properties, replace = false)
  }
  override def stageReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (MemTables.get(ident.name()).isEmpty)
      throw new NoSuchTableException(ident)
    stage(ident, columns, partitions, properties, replace = true)
  }
  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, columns, partitions, properties, replace = true)

  // user-facing table properties (write.mode, row.id) — Spark mixes in
  // reserved keys like owner/provider; keep only what MemTables reads
  private def memProps(properties: util.Map[String, String]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    properties.asScala.view.filterKeys(Set("write.mode", "row.id")).toMap
  }

  private var catName: String = "graft"
  private var dir: String = ""

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    dir = Option(options.get("dir")).getOrElse("")
  }
  override def name(): String = catName

  private val corpusTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // ---- namespaces -------------------------------------------------------
  private val namespaces = Seq("corpus", "mem")
  private def nsExists(ns: Array[String]): Boolean =
    ns.length == 1 &&
      (namespaces.contains(ns(0)) || ns(0) == "fn" || ns(0) == "sys")

  override def listNamespaces(): Array[Array[String]] =
    namespaces.map(Array(_)).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (nsExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    nsExists(namespace)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (nsExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft namespaces are fixed")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces are fixed")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft namespaces are fixed")

  // ---- tables -----------------------------------------------------------
  private def parquetTable(name: String, paths: Seq[String]): Table =
    ParquetTable(s"$catName.$name", SparkSession.active,
      CaseInsensitiveStringMap.empty(), paths, None, classOf[ParquetFileFormat])

  override def listTables(namespace: Array[String]): Array[Identifier] =
    namespace match {
      case Array("corpus") =>
        corpusTables.map(Identifier.of(namespace, _)).toArray
      case Array("mem") =>
        MemTables.names.map(Identifier.of(namespace, _)).toArray
      case _ => throw new NoSuchNamespaceException(namespace)
    }

  override def loadTable(ident: Identifier): Table = ident.namespace() match {
    case Array("corpus") if corpusTables.contains(ident.name()) =>
      parquetTable(s"corpus.${ident.name()}", Seq(s"$dir/${ident.name()}.parquet"))
    case Array("mem") =>
      MemTables.get(ident.name()) match {
        // partitioned tables carry the partition-DDL face (q86) —
        // unpartitioned ones must NOT expose an empty partitionSchema
        // to ALTER TABLE ... PARTITION resolution
        case Some(st) if st.partitionCols.nonEmpty =>
          new MemPartitionedTable(ident.name())
        case Some(_) => new MemTable(ident.name())
        case None    => throw new NoSuchTableException(ident)
      }
    case _ => throw new NoSuchTableException(ident)
  }

  /** SQL time travel: `FROM graft.corpus.documents VERSION AS OF v`.
    * Versions are the SnapshotLayout's append-only deltas — snapshot v
    * is the UNION of deltas 1..v, so older snapshots stay byte-stable as
    * new versions land. */
  override def loadTable(ident: Identifier, version: String): Table =
    if (ident.namespace().sameElements(Array("corpus")) &&
        ident.name() == "documents") {
      val v = version.toIntOption.filter(x => x >= 1 && x <= 2).getOrElse(
        throw new NoSuchTableException(ident))
      val base = SnapshotLayout.ensure(SparkSession.active, dir)
      parquetTable(s"corpus.documents@v$v", SnapshotLayout.pathsAsOf(base, v))
    } else throw new NoSuchTableException(ident)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (!ident.namespace().sameElements(Array("mem")))
      throw new UnsupportedOperationException(
        s"only graft.mem tables are writable, got $ident")
    val partCols = partitionColumns(partitions, schema)
    MemTables.create(ident.name(), schema, props = memProps(properties),
      partitionCols = partCols)
    if (partCols.nonEmpty) new MemPartitionedTable(ident.name())
    else new MemTable(ident.name())
  }
  // ---- schema evolution on mem tables (q78): ADD COLUMN (with an
  // optional DEFAULT materialized into existing rows — the "exists
  // default" a lakehouse format records in metadata; materializing at
  // alter time gives identical reads with a storeless row format),
  // RENAME COLUMN (pure metadata), DROP COLUMN (row projection). Each
  // change swaps schema + rows atomically.
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!ident.namespace().sameElements(Array("mem")))
      throw new UnsupportedOperationException(
        s"only graft.mem tables can be altered, got $ident")
    val state = MemTables.get(ident.name()).getOrElse(
      throw new NoSuchTableException(ident))
    changes.foldLeft(state.schema) { (schema, change) =>
      change match {
        case add: TableChange.AddColumn =>
          require(add.fieldNames().length == 1,
            "mem tables have no nested columns")
          val dv: Any = Option(add.defaultValue())
            .map(_.getValue.value() match {
              case u: org.apache.spark.unsafe.types.UTF8String => u.toString
              case other => other
            }).orNull
          val field = StructField(add.fieldNames()(0), add.dataType(),
            add.isNullable)
          val withMeta = Option(add.defaultValue()).map { d =>
            val sql = d.getSql
            field.copy(metadata = new MetadataBuilder()
              .putString("CURRENT_DEFAULT", sql)
              .putString("EXISTS_DEFAULT", sql).build())
          }.getOrElse(field)
          val next = schema.add(withMeta)
          MemTables.evolve(ident.name(), next, row => row :+ dv)
          next
        case ren: TableChange.RenameColumn =>
          val idx = schema.fieldNames.indexOf(ren.fieldNames()(0))
          require(idx >= 0, s"no column ${ren.fieldNames()(0)}")
          if (state.partitionCols.contains(ren.fieldNames()(0)))
            throw new UnsupportedOperationException(
              s"cannot rename partition column ${ren.fieldNames()(0)}")
          // a renamed identity column would leave a dangling
          // IdentitySpec and crash every subsequent INSERT (idIdx = -1)
          if (state.identity.exists(_.col == ren.fieldNames()(0)))
            throw new UnsupportedOperationException(
              s"cannot rename identity column ${ren.fieldNames()(0)}")
          // a renamed indexed column would leave dangling index specs
          // and dead zone maps (q89) — drop the index first
          if (state.indexes.get().values.exists(_ == ren.fieldNames()(0)))
            throw new UnsupportedOperationException(
              s"cannot rename indexed column ${ren.fieldNames()(0)}")
          // a CHECK constraint stores its predicate as SQL TEXT — a
          // rename would leave it pointing at a nonexistent name and
          // fail analysis on the NEXT enforced write; reject up front
          // (rewriting constraint SQL is a parser job, out of scope)
          val colRef = s"\\b${java.util.regex.Pattern.quote(ren.fieldNames()(0))}\\b".r
          state.constraints.collectFirst {
            case c: org.apache.spark.sql.connector.catalog.constraints.Check
                if colRef.findFirstIn(c.predicateSql()).isDefined => c
          }.foreach { c =>
            throw new UnsupportedOperationException(
              s"cannot rename ${ren.fieldNames()(0)}: referenced by CHECK " +
                s"constraint ${c.name()} (${c.predicateSql()})")
          }
          val next = StructType(schema.fields.updated(idx,
            schema.fields(idx).copy(name = ren.newName())))
          MemTables.evolve(ident.name(), next, identity)
          next
        case del: TableChange.DeleteColumn =>
          val idx = schema.fieldNames.indexOf(del.fieldNames()(0))
          require(idx >= 0, s"no column ${del.fieldNames()(0)}")
          if (state.partitionCols.contains(del.fieldNames()(0)))
            throw new UnsupportedOperationException(
              s"cannot drop partition column ${del.fieldNames()(0)}")
          if (state.identity.exists(_.col == del.fieldNames()(0)))
            throw new UnsupportedOperationException(
              s"cannot drop identity column ${del.fieldNames()(0)}")
          if (state.indexes.get().values.exists(_ == del.fieldNames()(0)))
            throw new UnsupportedOperationException(
              s"cannot drop indexed column ${del.fieldNames()(0)}")
          val next = StructType(
            schema.fields.patch(idx, Nil, 1))
          MemTables.evolve(ident.name(), next,
            row => row.patch(idx, Nil, 1))
          next
        case other =>
          throw new UnsupportedOperationException(
            s"unsupported table change: $other")
      }
    }
    new MemTable(ident.name())
  }
  override def dropTable(ident: Identifier): Boolean =
    ident.namespace().sameElements(Array("mem")) && MemTables.drop(ident.name())
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft tables cannot be renamed")

  // ---- functions (q64) --------------------------------------------------
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    namespace match {
      case Array("fn") =>
        CatalogFunctions.names.map(Identifier.of(namespace, _)).toArray
      case ns if nsExists(ns) => Array.empty
      case ns => throw new NoSuchNamespaceException(ns)
    }
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().sameElements(Array("fn")))
      CatalogFunctions.load(ident.name())
        .getOrElse(throw new NoSuchFunctionException(ident))
    else throw new NoSuchFunctionException(ident)
  override def functionExists(ident: Identifier): Boolean =
    ident.namespace().sameElements(Array("fn")) &&
      CatalogFunctions.load(ident.name()).isDefined
}
