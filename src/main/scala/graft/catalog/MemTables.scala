package graft.catalog

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Or => V2Or, Predicate}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-memory tables under the graft catalog's `mem` namespace — the
  * ROW-LEVEL-OPERATIONS face of the connector matrix (read q51, write
  * q52, stream st19/st20, pushdown q58/q61/q62 — this adds the DML
  * protocol a lakehouse table format plugs into): CREATE TABLE through
  * TableCatalog.createTable, INSERT INTO through a commit-message
  * BatchWrite (task writers surrender their buffered rows ONLY in
  * WriterCommitMessages; the driver folds exactly the one successful
  * attempt per task — the q52 exactly-once contract), and DELETE FROM
  * through SupportsDeleteV2: Spark translates the WHERE into V2
  * Predicates, canDeleteWhere vets that EVERY predicate is evaluable
  * here (a partial evaluation would delete the wrong rows — soundness
  * over coverage, the MvRewrite posture), and deleteWhere applies them
  * atomically against the row store.
  *
  * Deliberately single-JVM (a ConcurrentHashMap registry keyed by table
  * name — the AccountingSink scope): the POINT is the catalog/DML
  * protocol, which is identical on a cluster; a distributed store would
  * demonstrate storage, not the protocol. Row snapshots ride the
  * InputPartitions, so reads are consistent under concurrent DML. */
object MemTables {
  /** Identity-column declaration (q82): column, start, step,
    * allowExplicitInsert (BY DEFAULT vs ALWAYS). */
  final case class IdentitySpec(col: String, start: Long, step: Long,
      allowExplicitInsert: Boolean)

  final class State(val schema: StructType,
      val constraints: Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = Array.empty,
      val props: Map[String, String] = Map.empty,
      val partitionCols: Seq[String] = Nil,
      val identity: Option[IdentitySpec] = None) {
    val rows = new AtomicReference[Vector[Array[Any]]](Vector.empty)
    // the identity high-water mark — the table-level sequence a real
    // format persists in table metadata
    val identityNext = new java.util.concurrent.atomic.AtomicLong(
      identity.map(_.start).getOrElse(0L))
    // explicit partition registry (q86 — SupportsPartitionManagement):
    // partition value-tuple → partition properties. Writes auto-register
    // the values they touch (Hive dynamic-partition semantics); ADD
    // PARTITION registers an EMPTY partition, which is precisely what
    // the registry exists to represent beyond the rows themselves.
    val partitionMeta =
      new AtomicReference[Map[Vector[Any], Map[String, String]]](Map.empty)
    // secondary indexes (q89 — SupportsIndex): index name → BIGINT
    // column, plus the MAINTAINED per-block zone maps (min/max per
    // 1024-row block of the store, nulls excluded; an empty/all-null
    // block carries the (MaxValue, MinValue) sentinel that fails every
    // range check). Maintenance runs at every commit chokepoint — the
    // write-side cost a real index pays — and the SCAN consults the
    // PERSISTED zones, never a fresh pass over the data.
    val indexes = new AtomicReference[Map[String, String]](Map.empty)
    val indexZones =
      new AtomicReference[Map[String, Vector[(Long, Long)]]](Map.empty)
  }
  /** Zone-map block size (rows) for q89 secondary indexes. */
  val indexBlock = 1024
  private val registry = new ConcurrentHashMap[String, State]()

  // test observable: the last row-level command that went through the
  // GROUP-BASED rewrite (vs the metadata deleteWhere path) — single-JVM
  // scope, same caveat as AccountingSink.abortedTasks
  @volatile var lastRowLevelCommand: String = ""
  // test observable: per-op counts of the last DELTA (merge-on-read)
  // commit — (inserts, updates, deletes)
  @volatile var lastDeltaCounts: (Long, Long, Long) = (0L, 0L, 0L)
  // test observable (q89): the last index-hinted scan's block pruning —
  // "blocks=<planned>/<total>" or "fallback=<n>/<n>" when zones were
  // stale/absent
  @volatile var lastIndexSkip: String = ""

  def create(name: String, schema: StructType,
      constraints: Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = Array.empty,
      props: Map[String, String] = Map.empty,
      partitionCols: Seq[String] = Nil,
      identity: Option[IdentitySpec] = None): Unit =
    if (registry.putIfAbsent(name,
        new State(schema, constraints, props, partitionCols, identity)) != null)
      throw new IllegalStateException(s"mem table $name already exists")
  def drop(name: String): Boolean = registry.remove(name) != null
  def get(name: String): Option[State] = Option(registry.get(name))
  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }
  /** Schema evolution (q78): swap schema + rows under the registry lock
    * (computeIfPresent) so readers snapshot either the old or the new
    * shape, never a mix. */
  def evolve(name: String, newSchema: StructType,
      remap: Array[Any] => Array[Any]): Unit = {
    registry.computeIfPresent(name, (_, old) => {
      val next = new State(newSchema, old.constraints, old.props,
        old.partitionCols, old.identity)
      next.identityNext.set(old.identityNext.get())
      next.partitionMeta.set(old.partitionMeta.get())
      next.indexes.set(old.indexes.get())
      next.rows.set(old.rows.get().map(remap))
      next
    })
    // zone maps depend on column POSITIONS — rebuild under the new shape
    // (the catalog vetoes dropping/renaming an indexed column)
    if (registry.containsKey(name)) refreshIndexZones(name)
  }

  /** Atomic publish of a staged table (q80 — the commit half of the
    * StagedTable protocol): the fully-written rows become visible in
    * ONE registry operation. `replace=false` = atomic CTAS
    * (putIfAbsent — a concurrent create loses cleanly);
    * `replace=true` = atomic RTAS (the old table stays readable until
    * this single put swaps it). */
  def publish(name: String, schema: StructType, props: Map[String, String],
      rows: Vector[Array[Any]], replace: Boolean,
      partitionCols: Seq[String] = Nil): Unit = {
    val st = new State(schema, Array.empty, props, partitionCols)
    st.rows.set(rows)
    if (partitionCols.nonEmpty && rows.nonEmpty) {
      val idxs = partitionCols.map(c => schema.fieldNames.indexOf(c))
      st.partitionMeta.set(rows.iterator
        .map(r => idxs.map(r(_)).toVector).toSet
        .map((v: Vector[Any]) => v -> Map.empty[String, String]).toMap)
    }
    if (replace) { registry.put(name, st); () }
    else if (registry.putIfAbsent(name, st) != null)
      throw new IllegalStateException(s"mem table $name already exists")
  }

  /** Advance an identity high-water mark past an explicitly inserted
    * value (Delta's SYNC IDENTITY behavior, applied automatically at
    * commit): the next generated value becomes the first lattice point
    * start+k·step strictly beyond the explicit value in the step
    * direction, so GENERATED BY DEFAULT ids can never collide with
    * explicit ones (r14 advisory — previously an explicit 100 left the
    * sequence at 1 and a later generated id could land on 100). */
  def bumpIdentity(seq: java.util.concurrent.atomic.AtomicLong,
      explicitVal: Long, step: Long): Unit = {
    seq.updateAndGet { cur =>
      if ((step > 0 && explicitVal >= cur) || (step < 0 && explicitVal <= cur))
        cur + ((explicitVal - cur) / step + 1) * step
      else cur
    }
    ()
  }

  // DML helpers route through the same dropped-table guard the read
  // path uses — a table dropped mid-command surfaces as a clear
  // IllegalStateException, never a bare NPE. (DDL racing DML remains
  // out of scope for this single-JVM demo store: an `evolve` between a
  // command's scan and its commit can still discard a State the commit
  // then writes to — the keys serialize DDL before DML.)
  private def live(name: String): State = Option(registry.get(name)).getOrElse(
    throw new IllegalStateException(s"mem table $name was dropped"))
  def append(name: String, batch: Seq[Array[Any]]): Unit = {
    live(name).rows.updateAndGet(_ ++ batch)
    refreshIndexZones(name)
  }
  def replace(name: String, rows: Vector[Array[Any]]): Unit = {
    live(name).rows.set(rows)
    refreshIndexZones(name)
  }
  def deleteWhere(name: String, keep: Array[Any] => Boolean): Unit = {
    live(name).rows.updateAndGet(_.filter(keep))
    refreshIndexZones(name)
  }
  /** Predicate-scoped overwrite (q81): drop-matching + append in ONE
    * swap, so readers never observe the partition half-replaced. */
  def overwriteWhere(name: String, drop: Array[Any] => Boolean,
      batch: Seq[Array[Any]]): Unit = {
    live(name).rows.updateAndGet(_.filterNot(drop) ++ batch)
    refreshIndexZones(name)
  }

  /** Recompute the per-block zone maps of every indexed column (q89) —
    * the commit-side maintenance cost of a secondary index, paid at
    * every store mutation; O(rows) only when indexes exist. */
  def refreshIndexZones(name: String): Unit = {
    val st = live(name)
    val idxCols = st.indexes.get().values.toSet
    if (idxCols.isEmpty) { st.indexZones.set(Map.empty); return }
    val rows = st.rows.get()
    st.indexZones.set(idxCols.toSeq.map { c =>
      val ci = st.schema.fieldNames.indexOf(c)
      c -> rows.grouped(indexBlock).map { blk =>
        var mn = Long.MaxValue
        var mx = Long.MinValue
        blk.foreach { r =>
          r(ci) match {
            case l: java.lang.Long =>
              val v = l.longValue()
              if (v < mn) mn = v
              if (v > mx) mx = v
            case _ => () // nulls excluded; comparisons never match them
          }
        }
        (mn, mx)
      }.toVector
    }.toMap)
  }

  /** Dynamic partition registration (q86): every committed write adds
    * the partition values it touched to the registry — SHOW PARTITIONS
    * reflects inserts without DDL, the Hive/Iceberg behavior. */
  def registerPartitions(name: String, batch: Seq[Array[Any]]): Unit = {
    val st = live(name)
    if (st.partitionCols.nonEmpty && batch.nonEmpty) {
      val idxs = st.partitionCols.map(c => st.schema.fieldNames.indexOf(c))
      val vals = batch.iterator.map(r => idxs.map(r(_)).toVector).toSet
      st.partitionMeta.updateAndGet(m =>
        vals.foldLeft(m)((acc, v) =>
          if (acc.contains(v)) acc else acc.updated(v, Map.empty)))
      ()
    }
  }
}

/** Structural check + interpreter for the V2 predicate tree DELETE
  * delivers: AND/OR/NOT over {=, <>, <, <=, >, >=, IN, IS_NULL,
  * IS_NOT_NULL} leaves comparing a named field to literals. `supported`
  * and `eval` walk the same shapes — canDeleteWhere accepts exactly
  * what deleteWhere can apply. */
object MemPredicates {
  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other // = and <> are symmetric
  }

  /** Leaf normal form: (field, op, literal values). */
  private def leaf(p: Predicate): Option[(String, String, Seq[Any])] = {
    val kids = p.children()
    p.name() match {
      case op @ ("=" | "<=>" | "<>" | "<" | "<=" | ">" | ">=") => kids match {
        case Array(r: NamedReference, l: V2Literal[_]) =>
          Some((r.fieldNames.mkString("."), op, Seq(l.value)))
        case Array(l: V2Literal[_], r: NamedReference) =>
          Some((r.fieldNames.mkString("."), flip(op), Seq(l.value)))
        case _ => None
      }
      case "IN" => kids.headOption match {
        case Some(r: NamedReference)
            if kids.tail.forall(_.isInstanceOf[V2Literal[_]]) =>
          Some((r.fieldNames.mkString("."), "IN",
            kids.tail.toSeq.map(_.asInstanceOf[V2Literal[_]].value)))
        case _ => None
      }
      case op @ ("IS_NULL" | "IS_NOT_NULL") => kids match {
        case Array(r: NamedReference) =>
          Some((r.fieldNames.mkString("."), op, Seq.empty))
        case _ => None
      }
      case _ => None
    }
  }

  def supported(p: Predicate, fields: Set[String]): Boolean = p match {
    case a: V2And => supported(a.left(), fields) && supported(a.right(), fields)
    case o: V2Or  => supported(o.left(), fields) && supported(o.right(), fields)
    case n: V2Not => supported(n.child(), fields)
    case _ if p.name() == "ALWAYS_TRUE" || p.name() == "ALWAYS_FALSE" => true
    case _ => leaf(p).exists { case (f, _, vs) =>
      fields.contains(f) && vs.forall(v =>
        v == null || v.isInstanceOf[java.lang.Long] ||
          v.isInstanceOf[java.lang.Integer] || v.isInstanceOf[UTF8String] ||
          v.isInstanceOf[java.lang.Double] || v.isInstanceOf[java.lang.Boolean])
    }
  }

  /** Three-valued comparison collapsed to Boolean at the leaf (SQL
    * semantics: a NULL comparison is not-true, so the row is KEPT by
    * DELETE — matching what Spark's own filter would do). */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: java.lang.Long, y: java.lang.Long) => Some(java.lang.Long.compare(x, y))
    case (x: java.lang.Long, y: java.lang.Integer) => Some(java.lang.Long.compare(x, y.longValue()))
    case (x: java.lang.Integer, y: java.lang.Long) => Some(java.lang.Long.compare(x.longValue(), y))
    case (x: java.lang.Integer, y: java.lang.Integer) => Some(Integer.compare(x, y))
    case (x: java.lang.Double, y: java.lang.Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: UTF8String) => Some(x.compareTo(y.toString))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  def eval(p: Predicate, idx: Map[String, Int], row: Array[Any]): Boolean = p match {
    case a: V2And => eval(a.left(), idx, row) && eval(a.right(), idx, row)
    case o: V2Or  => eval(o.left(), idx, row) || eval(o.right(), idx, row)
    case n: V2Not => !eval(n.child(), idx, row)
    case _ if p.name() == "ALWAYS_TRUE"  => true
    case _ if p.name() == "ALWAYS_FALSE" => false
    case _ => leaf(p) match {
      case Some((f, op, vs)) =>
        val v = row(idx(f))
        op match {
          case "="  => cmp(v, vs.head).contains(0)
          // null-safe equality — how static INSERT OVERWRITE PARTITION
          // specs arrive (probed): NULL <=> NULL is TRUE
          case "<=>" =>
            (v == null && vs.head == null) || cmp(v, vs.head).contains(0)
          case "<>" => cmp(v, vs.head).exists(_ != 0)
          case "<"  => cmp(v, vs.head).exists(_ < 0)
          case "<=" => cmp(v, vs.head).exists(_ <= 0)
          case ">"  => cmp(v, vs.head).exists(_ > 0)
          case ">=" => cmp(v, vs.head).exists(_ >= 0)
          case "IN" => vs.exists(x => cmp(v, x).contains(0))
          case "IS_NULL"     => v == null
          case "IS_NOT_NULL" => v != null
        }
      case None => false // unreachable when canDeleteWhere vetted
    }
  }
}

class MemTable(tableName: String) extends Table
    with SupportsRead with SupportsWrite with SupportsDeleteV2
    with SupportsRowLevelOperations with SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.index.SupportsIndex {
  protected def state: MemTables.State = MemTables.get(tableName).getOrElse(
    throw new IllegalStateException(s"mem table $tableName was dropped"))

  // ---- secondary indexes (q89 — SupportsIndex, the CREATE INDEX /
  // DROP INDEX DDL face JDBC connectors implement; CreateIndexExec /
  // DropIndexExec wire it from SQL): a mem index is a per-block zone
  // map over a BIGINT column, MAINTAINED at every commit (the
  // write-side cost) and consulted by the scan as a ROWGROUP-SKIP hint
  // (the parquet model — nothing is absorbed, Spark keeps every
  // filter; the index only prunes provably-excluded blocks, so
  // soundness is the superset contract, same as q62's runtime prune).
  override def createIndex(indexName: String,
      columns: Array[NamedReference],
      columnsProperties: util.Map[NamedReference, util.Map[String, String]],
      properties: util.Map[String, String]): Unit = {
    require(columns.length == 1, "mem indexes are single-column")
    val c = columns(0).fieldNames.mkString(".")
    val st = state
    val fi = st.schema.fieldNames.indexOf(c)
    require(fi >= 0, s"no column $c")
    require(st.schema.fields(fi).dataType == LongType,
      s"mem indexes support BIGINT columns, $c is ${st.schema.fields(fi).dataType}")
    if (st.indexes.get().contains(indexName))
      throw new org.apache.spark.sql.catalyst.analysis.IndexAlreadyExistsException(
        indexName, name(), scala.None)
    st.indexes.updateAndGet(_.updated(indexName, c))
    MemTables.refreshIndexZones(tableName)
  }
  override def dropIndex(indexName: String): Unit = {
    if (!state.indexes.get().contains(indexName))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchIndexException(
        indexName, name(), scala.None)
    state.indexes.updateAndGet(_ - indexName)
    MemTables.refreshIndexZones(tableName)
  }
  override def indexExists(indexName: String): Boolean =
    state.indexes.get().contains(indexName)
  override def listIndexes(): Array[org.apache.spark.sql.connector.catalog.index.TableIndex] =
    state.indexes.get().toSeq.sortBy(_._1).map { case (n, c) =>
      new org.apache.spark.sql.connector.catalog.index.TableIndex(n, "zonemap",
        Array(org.apache.spark.sql.connector.expressions.Expressions.column(c)),
        java.util.Collections.emptyMap(), new java.util.Properties())
    }.toArray
  override def name(): String = s"graft.mem.$tableName"
  override def schema(): StructType = state.schema
  // identity partitioning (q81): declared at CREATE TABLE PARTITIONED
  // BY; the load-bearing consumer is the predicate-scoped INSERT
  // OVERWRITE below (static PARTITION (col=v) specs arrive as
  // overwrite predicates)
  override def partitioning(): Array[
      org.apache.spark.sql.connector.expressions.Transform] =
    state.partitionCols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c)).toArray
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)

  // ---- metadata columns (q72 — the Iceberg _file/_pos analog): _pos is
  // the row's position in the store snapshot. Readable from SQL
  // (SELECT _pos, * FROM graft.mem.t) and — the load-bearing use — the
  // column the row-level rewrite REQUESTS so its write receives cleanly
  // projected data rows (Spark's group-based task dispatches on the
  // __row_operation marker and projects data/metadata separately ONLY
  // when the operation requires metadata attrs; without one, the raw
  // rewrite row including the marker reaches the writer — probed).
  // CHECK constraints created with the table (q77): Spark's write path
  // reads these from Table.constraints() and enforces enforced CHECKs
  // row-by-row before any data reaches the writer
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    state.constraints

  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_pos"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row position in the mem-store snapshot"
    })

  // ---- UPDATE / MERGE through the GROUP-BASED row-level rewrite (q71
  // — the protocol Iceberg's copy-on-write tables implement): Spark
  // rewrites a row-level command into scan-affected-groups →
  // recompute-rows → ReplaceData. The operation's scan defines the
  // group universe; with no metadata columns to narrow groups, the
  // whole table is one group, so the write REPLACES the table content
  // atomically with the rewritten rows (unchanged + updated + merge
  // inserts together — they arrive in ONE BatchWrite commit, the
  // copy-on-write contract). DELETE keeps taking the cheaper
  // SupportsDeleteV2 metadata path when canDeleteWhere accepts; Spark
  // falls back to this rewrite when it vetoes — both faces on one
  // table, dispatched by predicate evaluability.
  // Protocol selection is a TABLE property (the Iceberg write.*.mode
  // pattern): 'write.mode'='merge-on-read' plans WriteDelta (q79 —
  // SupportsDelta, O(changed rows)); default is the copy-on-write
  // group rewrite (q71 — ReplaceData, O(touched group)).
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        if (state.props.get("write.mode").contains("merge-on-read"))
          new MemDeltaOperation(tableName, info.command())
        else if (state.identity.isDefined)
          // the group rewrite cannot tell PASS-THROUGH rows (which
          // carry their already-assigned identity values) from MERGE
          // inserts (which need fresh ones) — every row arrives through
          // the same writer. The delta protocol CAN (insert() is only
          // called for genuinely new rows), so identity tables require
          // merge-on-read for UPDATE/MERGE rather than silently
          // NULLing or rejecting pass-through identities.
          throw new UnsupportedOperationException(
            "row-level commands on identity tables require " +
              "'write.mode'='merge-on-read'")
        else new MemRowLevelOperation(tableName, info.command())
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(tableName, state)

  // SupportsOverwriteV2 (q81 — the ingest-idempotency face): a static
  // INSERT OVERWRITE ... PARTITION (col=v) arrives as overwrite
  // predicates scoped to that partition; plain INSERT OVERWRITE is the
  // default truncate() = overwrite(ALWAYS_TRUE). canOverwrite vets
  // every predicate with the SAME interpreter deleteWhere uses —
  // soundness over coverage (a partial match would drop wrong rows).
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwriteV2 {
      private var overwritePreds: Array[Predicate] = Array.empty
      override def canOverwrite(predicates: Array[Predicate]): Boolean = {
        val fields = state.schema.fieldNames.toSet
        predicates.forall(MemPredicates.supported(_, fields))
      }
      override def overwrite(predicates: Array[Predicate]): WriteBuilder = {
        overwritePreds = predicates; this
      }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(tableName, state.schema,
            overwrite = overwritePreds)
      }
    }

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean = {
    val fields = state.schema.fieldNames.toSet
    predicates.forall(MemPredicates.supported(_, fields))
  }
  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val idx = state.schema.fieldNames.zipWithIndex.toMap
    // delete rows matching ALL predicates (Spark ANDs the array); keep
    // the complement in one atomic swap
    MemTables.deleteWhere(tableName,
      row => !predicates.forall(MemPredicates.eval(_, idx, row)))
  }
}

/** Captures the State ONCE at build time: schema and rows are always
  * read from the SAME State object, so a concurrent `evolve` (which
  * swaps in a fresh State) can never pair old-schema column indices
  * with remapped rows — the scan just keeps reading its pre-evolve
  * snapshot shape. */
class MemScanBuilder(tableName: String, state: MemTables.State)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownV2Filters {
  // the pruned schema may include the _pos METADATA column (requested
  // by SQL or by the row-level rewrite) — resolve each projected field
  // to a table-column index, or -1 for _pos
  private var projected: StructType = state.schema
  // index skip-hints (q89): comparison predicates on INDEXED columns,
  // kept as (col, op, value) for zone-map block pruning. NOTHING is
  // absorbed — pushPredicates returns every predicate as residual and
  // pushedPredicates() stays empty (the parquet rowgroup model: Spark
  // keeps all its filters; the index only prunes blocks the zones
  // PROVE cannot match — the superset soundness contract).
  private var skipHints: Array[(String, String, Long)] = Array.empty
  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other
  }
  private def hintOf(p: Predicate, idxCols: Set[String])
      : Option[(String, String, Long)] = p.name() match {
    case op @ ("=" | "<" | "<=" | ">" | ">=") => p.children() match {
      case Array(r: NamedReference, l: V2Literal[_])
          if l.value.isInstanceOf[java.lang.Long] &&
            idxCols.contains(r.fieldNames.mkString(".")) =>
        Some((r.fieldNames.mkString("."), op, l.value.asInstanceOf[Long]))
      case Array(l: V2Literal[_], r: NamedReference)
          if l.value.isInstanceOf[java.lang.Long] &&
            idxCols.contains(r.fieldNames.mkString(".")) =>
        Some((r.fieldNames.mkString("."), flip(op), l.value.asInstanceOf[Long]))
      case _ => None
    }
    case _ => None
  }
  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    skipHints = predicates.flatMap(hintOf(_, state.indexes.get().values.toSet))
    predicates
  }
  override def pushedPredicates(): Array[Predicate] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    projected = requiredSchema
  override def build(): Scan =
    new MemScan(tableName, state, projected, skipHints)
}

class MemScan(tableName: String, state: MemTables.State, projected: StructType,
    skipHints: Array[(String, String, Long)] = Array.empty)
    extends Scan with Batch {
  private def schema: StructType = state.schema
  override def readSchema(): StructType = projected
  override def toBatch: Batch = this
  override def description(): String = s"MemTable $tableName" +
    (if (skipHints.nonEmpty)
      s", IndexSkipHints: [${skipHints.map { case (c, o, v) => s"$c $o $v" }.mkString(", ")}]"
     else "")

  /** Zone check: can ANY row of a block with [mn, mx] satisfy `op v`?
    * The empty/all-null sentinel (MaxValue, MinValue) fails every
    * check — null rows never match a comparison. */
  private def zoneMatches(op: String, v: Long, mn: Long, mx: Long): Boolean =
    op match {
      case "="  => v >= mn && v <= mx
      case "<"  => mn < v
      case "<=" => mn <= v
      case ">"  => mx > v
      case ">=" => mx >= v
    }

  override def planInputPartitions(): Array[InputPartition] = {
    // snapshot ONCE from the build-time State; slices ride the
    // partitions, so the read is consistent even if DML lands
    // mid-query. Each slice carries its base offset so _pos is the
    // row's global snapshot position.
    // Zones are read BEFORE the row snapshot; a write between the two
    // reads makes the zone block count disagree with the snapshot's —
    // the guard below then falls back to the full scan (soundness
    // first; the q62 superset contract).
    val zones = state.indexZones.get()
    val snap = state.rows.get()
    val nBlocks = (snap.size + MemTables.indexBlock - 1) / MemTables.indexBlock
    val hintsUsable = skipHints.nonEmpty && skipHints.forall { case (c, _, _) =>
      zones.get(c).exists(_.length == nBlocks)
    }
    if (hintsUsable && nBlocks > 0) {
      // q89: plan only the blocks the PERSISTED zone maps cannot
      // exclude; contiguous surviving runs merge into one partition
      val surviving = (0 until nBlocks).filter { b =>
        skipHints.forall { case (c, op, v) =>
          val (mn, mx) = zones(c)(b)
          zoneMatches(op, v, mn, mx)
        }
      }
      MemTables.lastIndexSkip = s"blocks=${surviving.length}/$nBlocks"
      val runs = surviving.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, b) if b == e + 1 => (s, b) :: rest
        case (acc, b) => (b, b) :: acc
      }.reverse
      runs.map { case (s, e) =>
        val from = s * MemTables.indexBlock
        val until = math.min(snap.size, (e + 1) * MemTables.indexBlock)
        MemPartition(snap.slice(from, until).toArray, from.toLong): InputPartition
      }.toArray match {
        case empty if empty.isEmpty => Array(MemPartition(Array.empty, 0L))
        case parts => parts
      }
    } else {
      if (skipHints.nonEmpty)
        MemTables.lastIndexSkip = s"fallback=$nBlocks/$nBlocks"
      val nSplits = math.max(1, math.min(8, snap.size / 1024))
      val width = math.max(1, (snap.size + nSplits - 1) / nSplits)
      snap.grouped(width).zipWithIndex.map { case (chunk, i) =>
        MemPartition(chunk.toArray, i.toLong * width): InputPartition
      }.toArray match {
        case empty if empty.isEmpty => Array(MemPartition(Array.empty, 0L))
        case parts => parts
      }
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemReaderFactory(
      projected.fields.map(f => schema.fieldNames.indexOf(f.name)))
}

case class MemPartition(rows: Array[Array[Any]], base: Long) extends InputPartition

/** srcIdx(i) = table-column index of projected field i, or -1 for the
  * _pos metadata column (emitted as base + row offset). */
class MemReaderFactory(srcIdx: Array[Int]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MemPartition]
    val rows = mp.rows
    new PartitionReader[InternalRow] {
      private var cur = -1
      override def next(): Boolean = { cur += 1; cur < rows.length }
      override def get(): InternalRow = {
        val src = rows(cur)
        val vals = new Array[Any](srcIdx.length)
        var i = 0
        while (i < srcIdx.length) {
          vals(i) =
            if (srcIdx(i) < 0) mp.base + cur
            else src(srcIdx(i)) match {
              case s: String => UTF8String.fromString(s)
              case other     => other
            }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}

/** The group-based row-level operation: the scan is the plain table
  * scan (the one group), the write replaces the table with the
  * rewritten rows in one atomic swap. */
class MemRowLevelOperation(tableName: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  private def state: MemTables.State = MemTables.get(tableName)
    .getOrElse(throw new IllegalStateException(s"mem table $tableName dropped"))
  private def schema: StructType = state.schema
  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"MemRowLevel[$cmd] $tableName"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(tableName, state)
  // requesting _pos is what flips Spark's rewrite into the
  // data/metadata-projecting write task: the writer then receives rows
  // in exactly the data schema (the __row_operation marker and _pos are
  // projected around it) — the Iceberg copy-on-write contract
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_pos"))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // the rewrite plan's write schema is NOT the table schema: Spark
    // prepends bookkeeping columns (__row_operation) for row-level
    // commands — map write fields to table columns BY NAME and drop the
    // extras (found empirically: a positional decode read the operation
    // marker as the first data column)
    val writeSchema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(tableName, schema,
            replaceAll = true, writeSchema = Some(writeSchema),
            rowLevelCmd = cmd.toString)
      }
    }
  }
}

/** Rows live ONLY in commit messages until the driver folds them —
  * retried/speculative attempts abort and their buffers vanish, so the
  * store sees exactly one successful attempt per task. */
case class MemRowsMessage(rows: Array[Array[Any]]) extends WriterCommitMessage

class MemBatchWrite(tableName: String, schema: StructType,
    overwrite: Array[Predicate] = Array.empty,
    replaceAll: Boolean = false, writeSchema: Option[StructType] = None,
    rowLevelCmd: String = "")
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val ws = writeSchema.getOrElse(schema)
    // target table position per write field; -1 = bookkeeping column
    // (e.g. __row_operation), decoded-but-dropped
    val target = ws.fields.map(f => schema.fieldNames.indexOf(f.name))
    new MemWriterFactory(ws.fields.map(_.dataType), target, schema.length)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val decoded = messages.toSeq.flatMap(_.asInstanceOf[MemRowsMessage].rows)
    // identity assignment (q82) happens AT COMMIT, where the fold is
    // already serialized — values come off the table's high-water-mark
    // sequence (start + k·step), so they are unique and monotone across
    // commits by construction. (A distributed format reserves per-task
    // ranges off the same high-water mark; the mem store's driver-side
    // fold makes the reservation trivially the whole batch.) GENERATED
    // ALWAYS rejects explicit values — the analyzer does NOT enforce
    // this (probed: an explicit insert reaches the writer), so the
    // connector must.
    val batch = MemTables.get(tableName).flatMap(_.identity) match {
      case Some(MemTables.IdentitySpec(col, _, step, allowExplicit))
          if !replaceAll =>
        val idIdx = schema.fieldNames.indexOf(col)
        val seq = MemTables.get(tableName).get.identityNext
        decoded.map { r =>
          if (r(idIdx) == null) r(idIdx) = seq.getAndAdd(step)
          else if (!allowExplicit) throw new IllegalArgumentException(
            s"cannot INSERT into GENERATED ALWAYS AS IDENTITY column $col")
          else MemTables.bumpIdentity(seq,
            r(idIdx).asInstanceOf[Number].longValue(), step)
          r
        }
      case _ => decoded
    }
    if (replaceAll) {
      // copy-on-write commit: the rewritten groups REPLACE the store in
      // one atomic swap — a concurrent reader sees old or new, never a
      // half-replaced mix. The observable records the command only when
      // the rewrite COMMITS (the operation also gets built speculatively
      // for deletes that OptimizeMetadataOnlyDeleteFromTable then routes
      // to the cheap deleteWhere path).
      MemTables.lastRowLevelCommand = rowLevelCmd
      MemTables.replace(tableName, batch.toVector)
      MemTables.registerPartitions(tableName, batch)
    } else if (overwrite.isEmpty) {
      MemTables.append(tableName, batch)
      MemTables.registerPartitions(tableName, batch)
    } else {
      // predicate-scoped overwrite in ONE atomic swap: rows matching
      // ALL predicates (Spark ANDs the array; ALWAYS_TRUE = truncate)
      // vanish, the new batch appends — other partitions SURVIVE
      val idx = schema.fieldNames.zipWithIndex.toMap
      MemTables.overwriteWhere(tableName,
        row => overwrite.forall(MemPredicates.eval(_, idx, row)), batch)
      MemTables.registerPartitions(tableName, batch)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** STAGED table (q80 — StagingTableCatalog's commit-or-vanish DDL
  * protocol, the atomic-CTAS/RTAS twin of the q52 write-commit
  * contract): the CTAS query writes into THIS object's buffer — the
  * registry never sees a row until commitStagedChanges publishes the
  * complete table in one atomic registry operation. A failure anywhere
  * between stage and commit leaves the catalog exactly as it was (no
  * half-table after a failed CREATE; the old table intact after a
  * failed REPLACE) — Spark calls abortStagedChanges and the buffer
  * vanishes with this instance. CatalogSpec injects a mid-write
  * failure on both paths. */
class StagedMemTable(tableName: String, stagedSchema: StructType,
    props: Map[String, String], replace: Boolean,
    partitionCols: Seq[String] = Nil)
    extends StagedTable with SupportsWrite {
  private val staged = new AtomicReference[Vector[Array[Any]]](Vector.empty)
  override def name(): String = s"graft.mem.$tableName (staged)"
  override def schema(): StructType = stagedSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // RTAS plans its write as truncate-then-append (probed: REPLACE
    // TABLE AS SELECT fails without SupportsTruncate) — truncating an
    // empty staging buffer is the identity
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pinfo: PhysicalWriteInfo): DataWriterFactory =
            new MemWriterFactory(stagedSchema.fields.map(_.dataType),
              stagedSchema.indices.toArray, stagedSchema.length)
          // rows land in the STAGED buffer only — the q52 exactly-once
          // fold, but the visibility boundary is commitStagedChanges
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            staged.set(messages.toVector
              .flatMap(_.asInstanceOf[MemRowsMessage].rows))
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  override def commitStagedChanges(): Unit =
    MemTables.publish(tableName, stagedSchema, props, staged.get(), replace,
      partitionCols)
  override def abortStagedChanges(): Unit = staged.set(Vector.empty)
}

/** InternalRow → JVM-value decoding shared by the batch and delta
  * writers (strings come back as java.lang.String so the store is
  * engine-agnostic). */
private[catalog] object MemRowCodec {
  def decodeValue(row: InternalRow, i: Int, dt: DataType): Any =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType    => row.getLong(i)
      case IntegerType => row.getInt(i)
      case DoubleType  => row.getDouble(i)
      case BooleanType => row.getBoolean(i)
      case StringType  => row.getUTF8String(i).toString
      case other => throw new UnsupportedOperationException(
        s"mem table column type $other")
    }
  /** Decode a write row into a table-width array, mapping write field i
    * to table position target(i); target(i) < 0 = bookkeeping column,
    * decoded-but-dropped. */
  def decodeRow(row: InternalRow, types: Array[DataType], target: Array[Int],
      tableWidth: Int): Array[Any] = {
    val vals = new Array[Any](tableWidth)
    var i = 0
    while (i < types.length) {
      if (target(i) >= 0) vals(target(i)) = decodeValue(row, i, types(i))
      i += 1
    }
    vals
  }
}

class MemWriterFactory(types: Array[DataType], target: Array[Int],
    tableWidth: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(row: InternalRow): Unit =
        buf += MemRowCodec.decodeRow(row, types, target, tableWidth)
      override def commit(): WriterCommitMessage = MemRowsMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

/** MERGE-ON-READ row-level operation (q79 — SupportsDelta, the half of
  * the row-level protocol real lakehouses run at 100 TB): q71's
  * copy-on-write ReplaceData rewrites EVERY row of a touched group;
  * this plans WriteDelta instead — each output row reaches the writer
  * TAGGED insert/update/delete (dispatched to the matching DeltaWriter
  * method), keyed by the declared rowId, so the write is O(changed
  * rows) not O(touched group). A real format would append a
  * delete-file + data-file pair and reconcile at read; the mem store
  * applies the same delta atomically at commit — the PROTOCOL (what
  * crosses the write boundary) is identical. */
class MemDeltaOperation(tableName: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {
  private def state: MemTables.State = MemTables.get(tableName)
    .getOrElse(throw new IllegalStateException(s"mem table $tableName dropped"))
  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"MemDelta[$cmd] $tableName"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(tableName, state)
  // the row identity Spark hands back to delete()/update() — a real
  // format uses its primary key / file+pos; mem tables declare it as a
  // table property (default: the `id` column)
  private def idCol: String = state.props.getOrElse("row.id", "id")
  override def rowId(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(idCol))
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new MemDeltaBatchWrite(tableName, state.schema, info, idCol,
            cmd.toString)
      }
    }
}

/** Deltas live ONLY in commit messages until the driver folds them —
  * the q52 exactly-once contract extended to three op kinds. */
case class MemDeltaMessage(inserts: Array[Array[Any]],
    updates: Array[(Any, Array[Any])],
    deletes: Array[Any]) extends WriterCommitMessage

class MemDeltaBatchWrite(tableName: String, schema: StructType,
    info: LogicalWriteInfo, idCol: String, cmdName: String)
    extends DeltaBatchWrite {
  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DeltaWriterFactory = {
    // write fields map to table columns BY NAME (the q71 lesson); the
    // rowId row's schema arrives separately through LogicalWriteInfo
    val types = info.schema().fields.map(_.dataType)
    val target = info.schema().fields.map(f => schema.fieldNames.indexOf(f.name))
    val idType = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException("delta write without rowIdSchema"))
      .fields(0).dataType
    new MemDeltaWriterFactory(types, target, schema.length, idType)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.map(_.asInstanceOf[MemDeltaMessage])
    val state = MemTables.get(tableName).getOrElse(
      throw new IllegalStateException(s"mem table $tableName dropped"))
    // identity assignment on MERGE-inserted rows (the delta protocol
    // CAN tell inserts from pass-through rows — insert() fires only
    // for new rows): null identities draw from the table sequence,
    // explicit ones are rejected under GENERATED ALWAYS — the same
    // contract as the append path
    val inserts = state.identity match {
      case Some(MemTables.IdentitySpec(col, _, step, allowExplicit)) =>
        val iIdx = schema.fieldNames.indexOf(col)
        msgs.flatMap(_.inserts).map { r =>
          if (r(iIdx) == null) r(iIdx) = state.identityNext.getAndAdd(step)
          else if (!allowExplicit) throw new IllegalArgumentException(
            s"cannot INSERT into GENERATED ALWAYS AS IDENTITY column $col")
          else MemTables.bumpIdentity(state.identityNext,
            r(iIdx).asInstanceOf[Number].longValue(), step)
          r
        }
      case None => msgs.flatMap(_.inserts)
    }
    val allUpdates = msgs.flatMap(_.updates)
    val allDeletes = msgs.flatMap(_.deletes)
    val updates = allUpdates.toMap
    val deletes = allDeletes.toSet
    // the delta fold keys ops on rowId — duplicate ids would make the
    // map/set collapse distinct ops silently and lastDeltaCounts lie
    // (r14 advisory). MERGE itself raises on duplicate source matches,
    // so a collapse here means the rowId precondition was violated:
    // fail the commit loudly instead.
    require(allUpdates.size == updates.size && allDeletes.size == deletes.size,
      s"duplicate rowId values in delta ops for $tableName " +
        s"(updates ${allUpdates.size}->${updates.size}, " +
        s"deletes ${allDeletes.size}->${deletes.size})")
    MemTables.lastRowLevelCommand = s"DELTA:$cmdName"
    // all three counted POST-dedup — the observable equals ops APPLIED
    MemTables.lastDeltaCounts =
      (inserts.size.toLong, updates.size.toLong, deletes.size.toLong)
    val idIdx = schema.fieldNames.indexOf(idCol)
    require(idIdx >= 0, s"rowId column $idCol not in table schema")
    // ONE atomic swap applies the whole delta: drop deleted ids,
    // substitute updated rows in place (store order preserved — the
    // _pos contract), append inserts
    state.rows.updateAndGet { rows =>
        // store-side precondition: a duplicated rowId that a delta op
        // touches would substitute/delete BOTH copies identically —
        // surface the broken row identity instead of applying it
        val touched = scala.collection.mutable.HashSet.empty[Any]
        rows.foreach { r =>
          val id = r(idIdx)
          if (deletes.contains(id) || updates.contains(id))
            require(touched.add(id),
              s"rowId $id is duplicated in $tableName and targeted by a delta op")
        }
        rows.flatMap { r =>
          val id = r(idIdx)
          if (deletes.contains(id)) None
          else updates.get(id).orElse(Some(r))
        } ++ inserts
      }
    // delta-written rows can land in (or move to) new partitions
    MemTables.registerPartitions(tableName, inserts ++ updates.values)
    MemTables.refreshIndexZones(tableName)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class MemDeltaWriterFactory(types: Array[DataType], target: Array[Int],
    tableWidth: Int, idType: DataType) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val ins = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      private val upd = scala.collection.mutable.ArrayBuffer.empty[(Any, Array[Any])]
      private val del = scala.collection.mutable.ArrayBuffer.empty[Any]
      override def insert(row: InternalRow): Unit =
        ins += MemRowCodec.decodeRow(row, types, target, tableWidth)
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        upd += ((MemRowCodec.decodeValue(id, 0, idType),
          MemRowCodec.decodeRow(row, types, target, tableWidth)))
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        del += MemRowCodec.decodeValue(id, 0, idType)
      override def commit(): WriterCommitMessage =
        MemDeltaMessage(ins.toArray, upd.toArray, del.toArray)
      override def abort(): Unit = { ins.clear(); upd.clear(); del.clear() }
      override def close(): Unit = ()
    }
}

/** Partition DDL on partitioned mem tables (q86 —
  * SupportsAtomicPartitionManagement, the natural completion of q81's
  * identity partitioning): SHOW PARTITIONS, ALTER TABLE ADD/DROP/RENAME
  * PARTITION and TRUNCATE ... PARTITION all resolve against the State's
  * explicit partition registry. The registry is partition METADATA —
  * an ADD PARTITION creates an empty partition that lists before any
  * row lands (the Hive/date-partitioned-deployment workflow: register
  * tomorrow's partition, then ingest into it), a DROP removes the
  * partition's rows with it, a TRUNCATE empties the rows but keeps the
  * partition listed. Writes auto-register the values they touch
  * (dynamic partitioning), so DDL-created and write-created partitions
  * are indistinguishable afterwards.
  *
  * Atomic variant contract (probed against AlterTableAddPartitionExec /
  * AlterTableDropPartitionExec): the bulk createPartitions must be
  * all-or-nothing — ANY existing ident fails the whole call with
  * PartitionsAlreadyExistException before a single registry change;
  * dropPartitions returns false (and drops nothing) if ANY ident is
  * missing. Registry and row store are separate atomics — fine for the
  * single-JVM demo store, a real format commits both in one snapshot. */
class MemPartitionedTable(tableName: String) extends MemTable(tableName)
    with SupportsAtomicPartitionManagement {
  import org.apache.spark.sql.catalyst.analysis.{NoSuchPartitionException, PartitionsAlreadyExistException}

  override def partitionSchema(): StructType = {
    val st = state
    StructType(st.partitionCols.map(c => st.schema(st.schema.fieldIndex(c))))
  }

  private def identValues(ident: InternalRow): Vector[Any] = {
    val ps = partitionSchema()
    (0 until ps.length).map(i =>
      MemRowCodec.decodeValue(ident, i, ps(i).dataType)).toVector
  }
  private def identRow(values: Vector[Any]): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case other     => other
    }.toArray)
  /** Row predicate: does a store row belong to partition `values`? */
  private def inPartition(values: Vector[Any]): Array[Any] => Boolean = {
    val st = state
    val idxs = st.partitionCols.map(c => st.schema.fieldNames.indexOf(c))
    row => idxs.map(row(_)).toVector == values
  }

  override def createPartitions(idents: Array[InternalRow],
      props: Array[util.Map[String, String]]): Unit = {
    import scala.jdk.CollectionConverters._
    val vals = idents.map(identValues)
    val st = state
    // all-or-nothing: vet EVERY ident against the registry first
    val existing = vals.filter(st.partitionMeta.get().contains)
    if (existing.nonEmpty)
      throw new PartitionsAlreadyExistException(name(),
        existing.toSeq.map(identRow), partitionSchema())
    st.partitionMeta.updateAndGet(m =>
      vals.zip(props).foldLeft(m) { case (acc, (v, p)) =>
        acc.updated(v, p.asScala.toMap) })
    ()
  }

  override def dropPartitions(idents: Array[InternalRow]): Boolean = {
    val vals = idents.map(identValues)
    val st = state
    if (!vals.forall(st.partitionMeta.get().contains)) return false
    st.partitionMeta.updateAndGet(m => vals.foldLeft(m)(_ - _))
    // dropping a partition drops its DATA too (the DDL contract — the
    // connector owns data removal, DropPartitionExec only calls here)
    val preds = vals.map(inPartition)
    MemTables.deleteWhere(tableName, row => !preds.exists(_(row)))
    true
  }

  override def partitionExists(ident: InternalRow): Boolean =
    state.partitionMeta.get().contains(identValues(ident))

  override def listPartitionIdentifiers(names: Array[String],
      ident: InternalRow): Array[InternalRow] = {
    val st = state
    // partial-spec filter: `names` is a PREFIX-free subset of the
    // partition columns; ident carries one value per name
    val nameIdx = names.map(st.partitionCols.indexOf)
    require(nameIdx.forall(_ >= 0),
      s"unknown partition column(s) ${names.mkString(",")}")
    val ps = partitionSchema()
    val want = names.indices.map(i =>
      MemRowCodec.decodeValue(ident, i, ps(nameIdx(i)).dataType))
    st.partitionMeta.get().keysIterator
      .filter(v => nameIdx.indices.forall(i => v(nameIdx(i)) == want(i)))
      .toArray.sortBy(_.mkString("/")).map(identRow)
  }

  override def loadPartitionMetadata(ident: InternalRow): util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    state.partitionMeta.get().get(identValues(ident))
      .map(_.asJava)
      .getOrElse(throw new NoSuchPartitionException(name(), ident,
        partitionSchema()))
  }

  override def replacePartitionMetadata(ident: InternalRow,
      props: util.Map[String, String]): Unit = {
    import scala.jdk.CollectionConverters._
    val v = identValues(ident)
    val st = state
    if (!st.partitionMeta.get().contains(v))
      throw new NoSuchPartitionException(name(), ident, partitionSchema())
    st.partitionMeta.updateAndGet(_.updated(v, props.asScala.toMap))
    ()
  }

  override def truncatePartition(ident: InternalRow): Boolean = {
    val v = identValues(ident)
    if (!state.partitionMeta.get().contains(v))
      throw new NoSuchPartitionException(name(), ident, partitionSchema())
    // rows vanish, the partition stays listed — the TRUNCATE contract
    val in = inPartition(v)
    MemTables.deleteWhere(tableName, row => !in(row))
    true
  }

  override def renamePartition(from: InternalRow, to: InternalRow): Boolean = {
    val fromV = identValues(from)
    val toV = identValues(to)
    val st = state
    if (!st.partitionMeta.get().contains(fromV))
      throw new NoSuchPartitionException(name(), from, partitionSchema())
    if (st.partitionMeta.get().contains(toV))
      throw new PartitionsAlreadyExistException(name(), to, partitionSchema())
    st.partitionMeta.updateAndGet(m => (m - fromV).updated(toV, m(fromV)))
    // rewrite the partition columns of the moved rows in one swap
    val idxs = st.partitionCols.map(c => st.schema.fieldNames.indexOf(c))
    val in = inPartition(fromV)
    st.rows.updateAndGet(_.map { row =>
      if (in(row)) {
        val next = row.clone()
        idxs.zipWithIndex.foreach { case (ci, i) => next(ci) = toV(i) }
        next
      } else row
    })
    true
  }
}
