package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** MATERIALIZED-VIEW substitution as a Catalyst optimizer rule — the
  * third extension surface after TopNPerKey (planner strategy) and the
  * native expressions (function injection): a registered rollup layout
  * answers matching aggregates over the fact WITHOUT scanning the fact.
  *
  * Matching is deliberately narrow and structural (the production MV
  * rewriters — Calcite, warehouse engines — prove general matching is a
  * research area; a narrow sound rewrite beats a broad unsound one):
  *   - the child must be the registered fact scan (a file-source
  *     relation whose root path carries the registered fragment),
  *     optionally under a pruning Project of plain attributes;
  *   - every grouping expression must be a bare column ⊆ the MV's
  *     grouping columns (a SUBSET is legal — the rewrite re-aggregates
  *     the finer-grained MV rows, sums being decomposable);
  *   - every aggregate must be SUM(cents(col)) for a registered cents
  *     column (the repo's exact-integer convention, matched as
  *     Cast(Round(col·100))→long) or COUNT(1)/COUNT(*), rewritten to
  *     SUM over the MV's partial sums / row counts.
  * Anything else leaves the plan untouched — one unmatched aggregate
  * vetoes the whole rewrite (soundness over coverage).
  *
  * Output attributes keep their original exprIds/names (aliases carry
  * them over), so nothing above the Aggregate re-resolves. COUNT
  * rewrites to coalesce(SUM(n),0) to preserve non-nullability. The rule
  * is OPT-IN per session via spark.graft.mv.enabled — a registry hit
  * must never silently change an unrelated query's plan gates.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** A registered rollup: fact path fragment → MV parquet path, the MV's
    * grouping columns, fact column name → MV partial-sum column for the
    * cents sums, and the MV's row-count column. */
  case class MvDef(factFragment: String, mvPath: String,
      groupCols: Set[String], centsCols: Map[String, String], countCol: String)

  @volatile private var defs: List[MvDef] = Nil
  // test observable: how many Aggregates the rule replaced
  val rewrites = new java.util.concurrent.atomic.AtomicLong(0L)

  def register(d: MvDef): Unit = synchronized {
    defs = d :: defs.filterNot(_.factFragment == d.factFragment)
  }
  def clear(): Unit = synchronized { defs = Nil }

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.mv.enabled", "false") == "true"

  private def isFactScan(plan: LogicalPlan, frag: String): Boolean = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.exists(_.toString.contains(frag))
      case _ => false
    }
    case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      isFactScan(p.child, frag)
    case _ => false
  }

  /** cents(col) after analysis+optimization: CAST(ROUND(col * 100.0, 0) AS BIGINT). */
  private def centsOf(e: Expression): Option[String] = e match {
    case c: Cast if c.dataType == LongType => c.child match {
      case r: Round =>
        val scaleOk = r.scale match {
          case Literal(0, _) => true
          case _             => false
        }
        if (!scaleOk) None
        else r.child match {
          case m: Multiply => (m.left, m.right) match {
            case (a: AttributeReference, Literal(d: Double, _)) if d == 100.0 => Some(a.name)
            case (Literal(d: Double, _), a: AttributeReference) if d == 100.0 => Some(a.name)
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  private def isCountStar(c: Count): Boolean = c.children match {
    case Seq(Literal(_, _)) => true
    case _                  => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || defs.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        defs.collectFirst {
          case d if isFactScan(agg.child, d.factFragment) =>
            tryRewrite(agg, d).getOrElse(agg)
        }.getOrElse(agg)
    }
  }

  private def tryRewrite(agg: Aggregate, d: MvDef): Option[Aggregate] = {
    val groupsOk = agg.groupingExpressions.forall {
      case a: AttributeReference => d.groupCols.contains(a.name)
      case _                     => false
    }
    if (!groupsOk) return None
    val mvPlan = SparkSession.active.read.parquet(d.mvPath)
      .queryExecution.analyzed
    val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
    // a mis-registered MV (missing group/sum/count columns) must veto,
    // not throw mid-optimization
    val needed = d.groupCols ++ d.centsCols.values ++ Seq(d.countCol)
    if (!needed.forall(mvAttr.contains)) return None

    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case g: AttributeReference if d.groupCols.contains(g.name) =>
        Some(Alias(mvAttr(g.name), g.name)(exprId = g.exprId))
      case al @ Alias(ae: AggregateExpression, name) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case s: Sum => centsOf(s.child).flatMap(d.centsCols.get).map { mvCol =>
            Alias(Sum(mvAttr(mvCol)).toAggregateExpression(),
              name)(exprId = al.exprId)
          }
          case c: Count if isCountStar(c) =>
            Some(Alias(Coalesce(Seq(
              Sum(mvAttr(d.countCol)).toAggregateExpression(),
              Literal(0L))), name)(exprId = al.exprId))
          case _ => None
        }
      case _ => None
    }
    if (rewritten.exists(_.isEmpty)) return None
    val newGroups = agg.groupingExpressions.map {
      case a: AttributeReference => mvAttr(a.name)
    }
    rewrites.incrementAndGet()
    Some(Aggregate(newGroups, rewritten.map(_.get), mvPlan))
  }
}
