package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity over its child, reported NON-DETERMINISTIC as an optimizer
  * barrier. The VALUE is fully deterministic (pure function of the
  * input row — safe under task retry and speculation); the flag only
  * tells Catalyst it may not inline, duplicate, constant-fold, derive
  * constraints from, or push predicates through this expression.
  *
  * Use it to pin an expensive derived column (e.g. a map-side
  * argmin/argmax fold over a broadcast codebook) that downstream
  * operators JOIN or FILTER on: without the barrier, the join key
  * substitutes the whole fold tree into the hash-probe key, and
  * InferFiltersFromConstraints adds `isnotnull(<fold>)` (plus any
  * range constraints from the other side) with further inlined copies
  * — the corpus then evaluates its assignment 3× per row (probed in
  * r16 on s18: the q85 inlining lesson at expression level, and the
  * guide-§4.4 duplication fix applied to a native expression).
  *
  * Cost of the flag: predicates on OTHER columns will not push through
  * the defining Project either — place the barrier where everything
  * below it is already filtered (or checkpointed).
  */
case class OpaqueBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OpaqueBarrier =
    copy(newChild)
}
