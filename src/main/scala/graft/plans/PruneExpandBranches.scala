package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prune `Expand` branches that a filter above is guaranteed
  * to reject.
  *
  * Motivation: `unpivot` lowers to `Expand` with one projection per measure,
  * where the measure-name column is a per-branch string literal. Catalyst
  * does not push predicates into `Expand`, so the reference's melt+isin
  * pattern (`unpivot(...).filter($"measure".isin(...))`, SURVEY.md §2a
  * O4+O5) materializes every branch and then throws half away — at 100 TB
  * that is reading and expanding columns that can never survive the filter.
  *
  * For each branch we substitute the branch's literal outputs into each
  * conjunct of the filter; a conjunct that folds to false or null (filter
  * semantics drop both) proves every row of that branch is rejected, so the
  * branch is removed. Rows of surviving branches are untouched and the
  * filter stays in place — output is provably identical. The child
  * projection is then narrowed so column pruning reaches the scan
  * (PhysicalOperation collapses the stacked projects during planning).
  */
object PruneExpandBranches extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def branchRejects(cond: Expression, output: Seq[Attribute],
                            projection: Seq[Expression]): Boolean = {
    val lits: Map[Long, Literal] = output.zip(projection).collect {
      case (attr, l: Literal) => attr.exprId.id -> l
    }.toMap
    splitConjuncts(cond).exists { conjunct =>
      val substituted = conjunct.transform {
        case a: AttributeReference if lits.contains(a.exprId.id) => lits(a.exprId.id)
      }
      // foldable excludes unevaluable reference-free expressions (scalar
      // subqueries survive into the optimized plan and would throw on eval)
      substituted.foldable && {
        try {
          val v = substituted.eval(InternalRow.empty)
          v == null || v == false
        } catch { case _: Exception => false }
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, e @ Expand(projections, output, child)) =>
      val kept = projections.filterNot(p => branchRejects(cond, output, p))
      if (kept.size == projections.size || kept.isEmpty) f
      else {
        val needed = AttributeSet(kept.flatMap(_.flatMap(_.references)))
        val newChild =
          if (needed == AttributeSet(child.output)) child
          else Project(child.output.filter(needed.contains), child)
        Filter(cond, Expand(kept, output, newChild))
      }
  }
}

/** Installs graft's extra optimizer rules on a session (idempotent). Also
  * usable at build time via `SparkSessionExtensions.injectOptimizerRule`.
  */
object GraftOptimizations {
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(PruneExpandBranches)) {
      spark.experimental.extraOptimizations = cur :+ PruneExpandBranches
    }
  }
}

/** Build-time installation of the WHOLE graft surface — optimizer rule plus
  * every custom function — so a deployment needs only
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) and no
  * per-session `register` calls.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PruneExpandBranches)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[graft.functions.CosineSimilarity]),
      graft.functions.VectorFunctions.cosineBuilder))
    e.injectFunction((FunctionIdentifier("sq_dist"),
      info("sq_dist", classOf[graft.functions.SquaredDistance]),
      graft.functions.DistanceFunctions.sqDistBuilder))
    e.injectFunction((FunctionIdentifier("bitset_intersect"),
      info("bitset_intersect", classOf[graft.functions.BitsetIntersectCount]),
      graft.functions.BitsetFunctions.intersectBuilder))
    e.injectFunction((FunctionIdentifier("graft_in_set"),
      info("graft_in_set", classOf[graft.functions.InLiteralSet]),
      graft.functions.SetMembership.inLiteralSetBuilder))
    e.injectFunction((FunctionIdentifier("winnow_spans"),
      info("winnow_spans", classOf[graft.functions.WinnowSpans]),
      graft.functions.WinnowFunctions.winnowBuilder))
    e.injectFunction((FunctionIdentifier("cdc_chunks"),
      info("cdc_chunks", classOf[graft.functions.CdcChunks]),
      graft.functions.CdcFunctions.cdcBuilder))
    e.injectFunction((FunctionIdentifier("hll_sketch"),
      info("hll_sketch", classOf[graft.functions.HllSketchAgg]),
      graft.functions.Hll.sketchBuilder))
    e.injectFunction((FunctionIdentifier("hll_union"),
      info("hll_union", classOf[graft.functions.HllUnionAgg]),
      graft.functions.Hll.unionBuilder))
    e.injectFunction((FunctionIdentifier("hll_estimate"),
      info("hll_estimate", classOf[graft.functions.HllEstimate]),
      graft.functions.Hll.estimateBuilder))
    e.injectFunction((FunctionIdentifier("cms_sketch"),
      info("cms_sketch", classOf[graft.functions.CmsSketchAgg]),
      graft.functions.Cms.sketchBuilder))
    e.injectFunction((FunctionIdentifier("cms_merge"),
      info("cms_merge", classOf[graft.functions.CmsMergeAgg]),
      graft.functions.Cms.mergeBuilder))
    e.injectFunction((FunctionIdentifier("cms_query"),
      info("cms_query", classOf[graft.functions.CmsQuery]),
      graft.functions.Cms.queryBuilder))
    e.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg", classOf[graft.functions.BloomAgg]),
      graft.functions.Bloom.aggBuilder))
    e.injectFunction((FunctionIdentifier("bloom_merge"),
      info("bloom_merge", classOf[graft.functions.BloomMergeAgg]),
      graft.functions.Bloom.mergeBuilder))
    e.injectFunction((FunctionIdentifier("bloom_contains"),
      info("bloom_contains", classOf[graft.functions.BloomContains]),
      graft.functions.Bloom.containsBuilder))
    e.injectFunction((FunctionIdentifier("topk_min"),
      info("topk_min", classOf[graft.functions.TopKMinAgg]),
      graft.functions.TopK.minBuilder))
  }
}
