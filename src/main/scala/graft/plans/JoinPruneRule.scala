package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType

import graft.ops.GraftFileIndex

/** AUTOMATIC join-driven file pruning — [[graft.ops.ManifestTable
  * .readJoinPruned]]'s probe moved INSIDE the planner, so a plain
  *
  * {{{ ManifestTable.read(spark, fact).join(broadcast(dim), "k") }}}
  *
  * prunes the fact scan's dirs with zero API opt-in: at planning time
  * the dim side's distinct join keys are collected (bounded — the
  * side must be broadcast-hinted, estimated under the broadcast
  * threshold, or fully in-memory, i.e. exactly the sides the join
  * itself will broadcast) and probed against the fact manifest's
  * committed blooms + zone maps; the scan's [[GraftFileIndex]] is
  * swapped for a narrowed copy. This is the Delta/Spark
  * dynamic-partition-pruning shape at this format's dir granularity,
  * done statically: the manifest already holds per-dir value
  * metadata, so no runtime subquery wiring is needed — the star-
  * schema tax ("scan the whole fact because the filter is on the
  * dim") disappears before a single task launches.
  *
  * Injected as a PRE-CBO rule (runs ONCE per optimization, after the
  * operator batch — a fixed-point batch must not run a rule that
  * executes jobs). The narrowed index reports `(kept, original
  * total)` through `lastPrune` so plans stay auditable.
  *
  * CONSERVATIVE by construction (false keeps only; backs off to the
  * unchanged plan, never fails the query):
  *   - only Inner and LeftSemi joins, deterministic equi-conditions,
  *     `AttributeReference = AttributeReference` conjuncts;
  *   - the key must reach the scan through Project / deterministic
  *     Filter / SubqueryAlias ONLY — any operator that could make
  *     surviving output depend on pruned rows (windows, limits,
  *     outer joins, aggregates) stops the walk;
  *   - the probe side executes driver-side ONCE (it re-executes at
  *     run time — the same double-evaluation trade Spark's own DPP
  *     accepts when it cannot reuse a broadcast); sides past
  *     `spark.graft.joinPrune.maxKeys` distinct keys back off
  *     silently;
  *   - dir exclusion follows `readJoinPruned`: aux-carrying entries
  *     never prune, metadata-less columns never prune, an empty dim
  *     prunes every dir, NULL keys are dropped.
  *
  * `spark.graft.joinPrune.enabled=false` turns the rule off. */
case class JoinPruneRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.joinPrune.enabled", "true").toBoolean
  private def maxKeys: Int =
    spark.conf.get("spark.graft.joinPrune.maxKeys", "100000").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), _)
          if (jt == Inner || jt == LeftSemi) && cond.deterministic =>
        pruneJoin(j, left, right, cond)
    }

  private def pruneJoin(j: Join, left: LogicalPlan, right: LogicalPlan,
                        cond: Expression): Join = {
    val pairs = splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
    }
    var newLeft = left
    var newRight = right
    var changed = false
    pairs.foreach { case (a, b) =>
      graftScan(newLeft, a).foreach { lr =>
        if (probeable(newRight, j.hint.rightHint))
          probeKeys(newRight, b).flatMap(ks => narrowIn(newLeft, lr, a, ks))
            .foreach { nl => newLeft = nl; changed = true }
      }
      // a LeftSemi's right side is a pure filter source: dirs holding
      // none of the left keys can never produce a match — same rule
      // as Inner
      graftScan(newRight, b).foreach { lr =>
        if (probeable(newLeft, j.hint.leftHint))
          probeKeys(newLeft, a).flatMap(ks => narrowIn(newRight, lr, b, ks))
            .foreach { nr => newRight = nr; changed = true }
      }
    }
    if (changed) j.copy(left = newLeft, right = newRight) else j
  }

  /** The unique manifest scan `key` provably passes through unchanged
    * — Project / deterministic Filter / SubqueryAlias only. Already-
    * narrowed scans and single-dir tables answer None (nothing to
    * gain). */
  @annotation.tailrec
  private def graftScan(p: LogicalPlan,
                        key: AttributeReference): Option[LogicalRelation] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if lr.outputSet.contains(key) => fs.location match {
        case g: GraftFileIndex if !g.isNarrowed && g.dirCount > 1 => Some(lr)
        case _ => None
      }
      case _ => None
    }
    case Project(_, child) if child.outputSet.contains(key) => graftScan(child, key)
    case f: Filter if f.condition.deterministic => graftScan(f.child, key)
    case SubqueryAlias(_, child) => graftScan(child, key)
    case _ => None
  }

  /** A side is probe-able when the join would broadcast it anyway:
    * broadcast-hinted, fully in-memory, or estimated under the
    * broadcast threshold. */
  private def probeable(side: LogicalPlan, hint: Option[HintInfo]): Boolean =
    hint.exists(_.strategy.contains(BROADCAST)) ||
      side.collectLeaves().forall(_.isInstanceOf[LocalRelation]) || {
        val t = spark.sessionState.conf.autoBroadcastJoinThreshold
        t > 0 && side.stats.sizeInBytes <= t
      }

  /** Collect the side's distinct join keys as the strings the blooms
    * hash (`CAST(k AS STRING)` — readJoinPruned's contract). None =
    * over the cap or failed: back off, never fail the query. */
  private def probeKeys(side: LogicalPlan,
                        key: AttributeReference): Option[Seq[String]] = try {
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val probe = Distinct(Project(
      Seq(Alias(Cast(key, StringType, tz), "__k")()), side))
    val rows = org.apache.spark.sql.graft.PlanBridge.ofRows(spark, probe)
      .limit(maxKeys + 1).collect()
    if (rows.length > maxKeys) {
      logInfo(s"graft join-prune: ${key.name} side exceeds $maxKeys distinct " +
        "keys — skipping the planning-time probe")
      None
    } else Some(rows.iterator.map(_.getString(0)).filter(_ != null).toSeq)
  } catch {
    case scala.util.control.NonFatal(e) =>
      logInfo(s"graft join-prune: probe of ${key.name} failed (${e.getMessage}) " +
        "— leaving the plan unchanged")
      None
  }

  /** Swap `lr`'s index for the narrowed copy inside `side`. */
  private def narrowIn(side: LogicalPlan, lr: LogicalRelation,
                       key: AttributeReference,
                       keys: Seq[String]): Option[LogicalPlan] = {
    val fs = lr.relation.asInstanceOf[HadoopFsRelation]
    fs.location.asInstanceOf[GraftFileIndex].joinNarrow(key.name, keys).map { idx =>
      side.transformUp {
        case l: LogicalRelation if l eq lr =>
          l.copy(relation = fs.copy(location = idx)(fs.sparkSession))
      }
    }
  }
}
