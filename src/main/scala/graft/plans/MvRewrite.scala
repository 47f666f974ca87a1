package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
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
  *   - every aggregate must be SUM/MIN/MAX over cents(col) for a
  *     registered partial column (the repo's exact-integer convention,
  *     matched as Cast(Round(col·100))→long) or COUNT(<non-null lit>),
  *     rewritten to the same decomposable aggregate over the MV's
  *     partials (SUM of sums, MIN of mins, MAX of maxes, SUM of counts).
  * Anything else leaves the plan untouched — one unmatched aggregate
  * vetoes the whole rewrite (soundness over coverage).
  *
  * Output attributes keep their original exprIds/names (aliases carry
  * them over), so nothing above the Aggregate re-resolves. COUNT
  * rewrites to coalesce(SUM(n),0) to preserve non-nullability. The rule
  * is OPT-IN per session via spark.graft.mv.enabled — a registry hit
  * must never silently change an unrelated query's plan gates.
  *
  * register() resolves everything expensive ONCE: the MV's analyzed
  * plan is cached (per-rewrite substitution only refreshes exprIds via
  * newInstance — no file listing per optimization pass) and the fact's
  * file listing is fingerprinted, so a fact rewritten after
  * registration VETOES the rewrite instead of serving stale MV rows.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** A registered rollup: fact path fragment → MV parquet path, the MV's
    * grouping columns, fact column name → MV partial column for the
    * cents sums / mins / maxes, and the MV's row-count column. MIN/MAX
    * are decomposable exactly like SUM (min of per-group mins == global
    * min), so they share the contract. */
  case class MvDef(factFragment: String, mvPath: String,
      groupCols: Set[String], centsCols: Map[String, String], countCol: String,
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty)

  /** Registration record: the MvDef plus everything register() resolves
    * ONCE — the analyzed MV plan (so the rule never re-lists the MV
    * parquet per optimization pass) and a freshness fingerprint of the
    * fact's file listing (so a fact rewritten AFTER registration vetoes
    * the rewrite instead of serving stale MV rows). */
  private case class MvReg(d: MvDef, template: LogicalPlan,
      factFingerprint: Option[String])

  @volatile private var defs: List[MvReg] = Nil
  // test observable: how many Aggregates the rule replaced
  val rewrites = new java.util.concurrent.atomic.AtomicLong(0L)

  private def listingFingerprint(rel: HadoopFsRelation): String = {
    val files = rel.location.inputFiles.sorted.mkString("\n")
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${rel.location.sizeInBytes}|$files".getBytes("UTF-8"))
    bytes.map(b => f"$b%02x").mkString
  }

  // A FileIndex's listing is resolved at analysis and immutable for the
  // life of the instance, so the O(files) sort+hash above runs ONCE per
  // FileIndex — not once per optimizer invocation × fixed-point re-run
  // (a large fact has thousands of files; the rule fires on every
  // Aggregate). IDENTITY-keyed, deliberately: InMemoryFileIndex defines
  // equals by root paths, so an equals-keyed cache would hand a fresh
  // post-rewrite FileIndex the STALE fingerprint and defeat the
  // freshness veto. Bounded (cleared at 64 entries) instead of weak —
  // the JDK has no identity+weak map, and the population is one index
  // per fact read, so the clear is a re-hash, not a correctness event.
  private val fpCache =
    java.util.Collections.synchronizedMap(
      new java.util.IdentityHashMap[AnyRef, String]())
  private def fingerprintCached(fs: HadoopFsRelation): String = {
    val key: AnyRef = fs.location
    val hit = fpCache.get(key)
    if (hit != null) hit
    else {
      val fp = listingFingerprint(fs)
      if (fpCache.size() >= 64) fpCache.clear()
      fpCache.put(key, fp)
      fp
    }
  }

  private def relationOf(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => Some(fs)
        case _                    => None
      }
      case _ => None
    }

  def register(d: MvDef, session: SparkSession = null): Unit = synchronized {
    val spark = Option(session).getOrElse(SparkSession.active)
    // resolve the MV ONCE: the analyzed plan carries the file listing;
    // per-rewrite instantiation only refreshes exprIds (newInstance),
    // never re-lists
    val template = spark.read.parquet(d.mvPath).queryExecution.analyzed
    // fingerprint the fact listing as of registration; a non-path
    // fragment (or an unreadable fact) degrades to no freshness check
    val fp = scala.util.Try(
      relationOf(spark.read.parquet(d.factFragment).queryExecution.analyzed)
        .map(listingFingerprint)).toOption.flatten
    defs = MvReg(d, template, fp) :: defs.filterNot(_.d.factFragment == d.factFragment)
  }
  def clear(): Unit = synchronized { defs = Nil }

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.mv.enabled", "false") == "true"

  private def isFactScan(plan: LogicalPlan, reg: MvReg): Boolean = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.contains(reg.d.factFragment)) &&
          // freshness veto: the fact's CURRENT listing must still match
          // the one fingerprinted at register time — rewritten/compacted
          // fact files silently invalidate the MV
          reg.factFingerprint.forall(_ == fingerprintCached(fs))
      case _ => false
    }
    case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      isFactScan(p.child, reg)
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
    // non-null literal only: COUNT(NULL) evaluates to 0 on the fact and
    // must NOT rewrite to the row count
    case Seq(Literal(v, _)) if v != null => true
    case _                               => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || defs.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        defs.collectFirst {
          case reg if isFactScan(agg.child, reg) =>
            tryRewrite(agg, reg).getOrElse(agg)
        }.getOrElse(agg)
    }
  }

  private def tryRewrite(agg: Aggregate, reg: MvReg): Option[Aggregate] = {
    val d = reg.d
    val groupsOk = agg.groupingExpressions.forall {
      case a: AttributeReference => d.groupCols.contains(a.name)
      case _                     => false
    }
    if (!groupsOk) return None
    // fresh exprIds per substitution (two rewritten Aggregates in one
    // query must not share attribute ids) WITHOUT re-analyzing: the
    // cached template's relations re-instantiate in place
    val mvPlan = reg.template.transformUp {
      case mi: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        mi.newInstance()
    }
    val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
    // a mis-registered MV (missing group/sum/count columns) must veto,
    // not throw mid-optimization
    val needed = d.groupCols ++ d.centsCols.values ++ d.minCols.values ++
      d.maxCols.values ++ Seq(d.countCol)
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
          // MIN/MAX decompose identically: min over per-group partial
          // mins IS the global min (same for max)
          case m: Min => centsOf(m.child).flatMap(d.minCols.get).map { mvCol =>
            Alias(Min(mvAttr(mvCol)).toAggregateExpression(),
              name)(exprId = al.exprId)
          }
          case m: Max => centsOf(m.child).flatMap(d.maxCols.get).map { mvCol =>
            Alias(Max(mvAttr(mvCol)).toAggregateExpression(),
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
