package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stored procedures under `graft.sys` (q84 — ProcedureCatalog, Spark
  * 4.1's CALL statement: the maintenance-operation surface every
  * lakehouse ships — Iceberg's system.rewrite_data_files /
  * expire_snapshots are CALLs): procedures resolve by name through the
  * catalog, bind against the argument types the analyzer supplies
  * (named arguments — CALL graft.sys.compact(table => 't')), execute
  * driver-side against table state, and return their summary as rows
  * through a LocalScan.
  *
  * `compact` is the OPTIMIZE analog a row store can honor exactly:
  * sort the store by `id` in ONE atomic swap. Its observable effect is
  * q72's `_pos` metadata column — after compaction _pos == the id rank,
  * which is what makes the key's oracle closed-form (a multi-task
  * insert's store order is task-commit order; compaction makes it
  * deterministic). */
object GraftProcedures {
  val names: Seq[String] = Seq("compact")

  def load(name: String): Option[UnboundProcedure] = name match {
    case "compact" => Some(CompactProcedure)
    case _ => None
  }

  private def summaryScan(schema: StructType,
      vals: Array[Any]): Scan = new LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      Array(new GenericInternalRow(vals))
    override def description(): String = "procedure summary"
  }

  object CompactProcedure extends UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "sort a graft.mem table's row store by id in one atomic swap"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = "compact"
        override def description(): String = CompactProcedure.this.description()
        override def parameters(): Array[ProcedureParameter] =
          Array(ProcedureParameter.in("table", StringType).build())
        // mutates table state — never constant-folded or re-executed
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val tbl = input.getUTF8String(0).toString
          val st = MemTables.get(tbl).getOrElse(
            throw new IllegalStateException(s"mem table $tbl does not exist"))
          val idIdx = st.schema.fieldNames.indexOf("id")
          require(idIdx >= 0, s"compact requires an `id` column on $tbl")
          require(st.schema.fields(idIdx).dataType == LongType,
            s"compact sorts BIGINT ids; $tbl.id is " +
              st.schema.fields(idIdx).dataType.simpleString)
          var n = 0L
          st.rows.updateAndGet { rows =>
            n = rows.length
            // NULL ids sort first (id is nullable on plain mem tables —
            // a bare cast would NPE on the first null row)
            rows.sortBy(r => Option(r(idIdx))
              .map(_.asInstanceOf[java.lang.Long].longValue())
              .getOrElse(Long.MinValue))
          }
          java.util.List.of(summaryScan(
            StructType(Seq(StructField("table_name", StringType, nullable = false),
              StructField("rows_compacted", LongType, nullable = false))),
            Array[Any](UTF8String.fromString(tbl), n))).iterator()
        }
      }
  }
}
