package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi, RightOuter}
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
  *   - Inner and LeftSemi narrow either side; LeftOuter / RightOuter
  *     narrow ONLY the non-preserved (build) side — the preserved
  *     side's rows survive the join regardless of a match, so its
  *     scan must never lose a dir, while build-side dirs holding none
  *     of the preserved side's keys can only produce unmatched build
  *     rows the join drops anyway. Deterministic equi-conditions,
  *     `AttributeReference = AttributeReference` conjuncts only;
  *   - the key must reach the scan through Project / deterministic
  *     Filter / SubqueryAlias ONLY — any operator that could make
  *     surviving output depend on pruned rows (windows, limits,
  *     outer joins, aggregates) stops the walk;
  *   - the PROBE side must be repeat-stable ([[sideStable]]): it
  *     executes once at planning and again at run time (the same
  *     double-evaluation trade Spark's own DPP accepts when it
  *     cannot reuse a broadcast), so any nondeterministic expression
  *     (`rand()`, monotonically_increasing_id), a `Sample`, an
  *     `Offset`, or a `Limit` not directly over a `Sort` could yield
  *     RUNTIME keys absent from the planning-time probe — rows of
  *     already-pruned dirs would silently vanish. Such sides back
  *     off, mirroring the determinism constraints Spark's DPP
  *     applies to its pruning subquery;
  *   - probe results are MEMOIZED per canonicalized probe plan
  *     ([[probeCache]]): every action on the same DataFrame (and
  *     `explain()`) re-runs the optimizer, and without the cache each
  *     re-run would re-execute the dim collect as a fresh driver-side
  *     job. Keying by the canonicalized plan is staleness-safe here
  *     because a manifest re-read at a new version materializes a NEW
  *     `GraftFileIndex` (reference identity — no custom equals), and
  *     a LocalRelation's data is part of its canonical form; sides
  *     that could drift between identical-looking plans are exactly
  *     the nondeterministic ones [[sideStable]] already rejects.
  *     Over-cap probes memoize their refusal too (re-probing would
  *     re-pay the job only to refuse again);
  *   - sides past `spark.graft.joinPrune.maxKeys` distinct keys back
  *     off silently;
  *   - dir exclusion follows `readJoinPruned`: aux-carrying entries
  *     never prune, metadata-less columns never prune, an empty dim
  *     prunes every dir, NULL keys are dropped;
  *   - a scan may be narrowed MORE THAN ONCE in one plan: a fact
  *     joined to two selective dims intersects both narrowings
  *     (transformUp reaches the inner join first; the outer join then
  *     narrows the already-narrowed index further — `joinNarrow`
  *     preserves the ORIGINAL dir total for evidence reporting).
  *
  * `spark.graft.joinPrune.enabled=false` turns the rule off. */
object JoinPruneRule {
  /** Test instrument: how many times a probe actually EXECUTED a
    * driver-side job (cache misses). Process-wide — specs diff it
    * around a forced optimization to pin the memo behavior. */
  private[graft] val probeExecutions = new java.util.concurrent.atomic.AtomicInteger

  /** The probe memo. Lives on the COMPANION, not the rule instance —
    * the extension injector builds a FRESH rule per optimization, so
    * an instance field would never carry a result from one action to
    * the next (verified empirically; this is exactly the repeated-
    * probe cost the memo exists to kill). Keying by the canonicalized
    * probe plan makes cross-session sharing safe: the key embeds a
    * LocalRelation's literal data or a file relation's FileIndex
    * reference identity, so equal keys mean equal bytes underneath.
    * LRU, small and bounded: values are distinct-key string sets
    * already capped at `maxKeys`. Access is synchronized — plans may
    * optimize concurrently. */
  private val probeCache =
    new java.util.LinkedHashMap[LogicalPlan, Option[Seq[String]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, Option[Seq[String]]]): Boolean =
        size > 32
    }
}

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
          if (jt == Inner || jt == LeftSemi || jt == LeftOuter ||
            jt == RightOuter) && cond.deterministic =>
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
    // which sides may LOSE dirs: an outer join's preserved side keeps
    // non-matching rows, so only its build side is prunable
    val mayNarrowLeft = j.joinType == Inner || j.joinType == LeftSemi ||
      j.joinType == RightOuter
    val mayNarrowRight = j.joinType == Inner || j.joinType == LeftSemi ||
      j.joinType == LeftOuter
    var newLeft = left
    var newRight = right
    var changed = false
    pairs.foreach { case (a, b) =>
      if (mayNarrowLeft) graftScan(newLeft, a).foreach { lr =>
        if (probeable(newRight, j.hint.rightHint))
          probeKeys(newRight, b).flatMap(ks => narrowIn(newLeft, lr, a, ks))
            .foreach { nl => newLeft = nl; changed = true }
      }
      // a LeftSemi's right side is a pure filter source: dirs holding
      // none of the left keys can never produce a match — same rule
      // as Inner
      if (mayNarrowRight) graftScan(newRight, b).foreach { lr =>
        if (probeable(newLeft, j.hint.leftHint))
          probeKeys(newLeft, a).flatMap(ks => narrowIn(newRight, lr, b, ks))
            .foreach { nr => newRight = nr; changed = true }
      }
    }
    if (changed) j.copy(left = newLeft, right = newRight) else j
  }

  /** The unique manifest scan `key` provably passes through unchanged
    * — Project / deterministic Filter / SubqueryAlias, plus ANOTHER
    * deterministic Join's key-carrying child. The join descent is
    * what lets `fact ⋈ dim1 ⋈ dim2` intersect both dims' narrowings:
    * it is safe because a join is a row-level operator — removing
    * child rows whose key ∉ keyset only removes (or null-extends,
    * for outer shapes) output rows whose PROPAGATED key is ∉ keyset
    * or NULL, and the narrowing equi-join above drops both (NULL
    * never equi-matches). Operators whose surviving output depends
    * on pruned rows (windows, aggregates, limits) still stop the
    * walk. Single-dir (or fully-narrowed) indexes answer None
    * (nothing to gain); an ALREADY-narrowed multi-dir index is fair
    * game — a second dim's keys intersect the first narrowing. */
  @annotation.tailrec
  private def graftScan(p: LogicalPlan,
                        key: AttributeReference): Option[LogicalRelation] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if lr.outputSet.contains(key) => fs.location match {
        case g: GraftFileIndex if g.dirCount > 1 => Some(lr)
        case _ => None
      }
      case _ => None
    }
    case Project(_, child) if child.outputSet.contains(key) => graftScan(child, key)
    case f: Filter if f.condition.deterministic => graftScan(f.child, key)
    case SubqueryAlias(_, child) => graftScan(child, key)
    case jn: Join if jn.condition.forall(_.deterministic) &&
        (jn.left.outputSet.contains(key) || jn.right.outputSet.contains(key)) =>
      graftScan(
        if (jn.left.outputSet.contains(key)) jn.left else jn.right, key)
    case _ => None
  }

  /** A side is probe-able when the join would broadcast it anyway
    * (broadcast-hinted, fully in-memory, or estimated under the
    * broadcast threshold) AND re-executing it reproduces the same
    * rows ([[sideStable]]). */
  private def probeable(side: LogicalPlan, hint: Option[HintInfo]): Boolean =
    sideStable(side) && (hint.exists(_.strategy.contains(BROADCAST)) ||
      side.collectLeaves().forall(_.isInstanceOf[LocalRelation]) || {
        val t = spark.sessionState.conf.autoBroadcastJoinThreshold
        t > 0 && side.stats.sizeInBytes <= t
      })

  /** True when executing `side` twice provably yields the same key
    * set — the safety contract of a planning-time probe that the join
    * re-executes at run time. Rejects any nondeterministic expression
    * and every order-unstable operator: `Sample`, `Offset`, and a
    * `LocalLimit` whose input is not a `Sort` (an unsorted limit is
    * free to return a different row subset per execution; the
    * `GlobalLimit` above it is covered by checking the local one).
    * Mirrors the constraints Spark's DPP places on its pruning
    * subquery. */
  private def sideStable(side: LogicalPlan): Boolean = !side.exists {
    case _: Sample => true
    case _: Offset => true
    case l: LocalLimit => !l.child.isInstanceOf[Sort]
    case p => p.expressions.exists(e => !e.deterministic)
  }

  /** Collect the side's distinct join keys as the strings the blooms
    * hash (`CAST(k AS STRING)` — readJoinPruned's contract). None =
    * over the cap or failed: back off, never fail the query.
    * Memoized in [[probeCache]] (over-cap refusals included);
    * exceptions are NOT memoized — a transient failure should not
    * poison the session. */
  private def probeKeys(side: LogicalPlan,
                        key: AttributeReference): Option[Seq[String]] = try {
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val probe = Distinct(Project(
      Seq(Alias(Cast(key, StringType, tz), "__k")()), side))
    val ck = probe.canonicalized
    val cached = JoinPruneRule.probeCache.synchronized(Option(JoinPruneRule.probeCache.get(ck)))
    cached.getOrElse {
      JoinPruneRule.probeExecutions.incrementAndGet()
      val rows = org.apache.spark.sql.graft.PlanBridge.ofRows(spark, probe)
        .limit(maxKeys + 1).collect()
      val res = if (rows.length > maxKeys) {
        logInfo(s"graft join-prune: ${key.name} side exceeds $maxKeys distinct " +
          "keys — skipping the planning-time probe")
        None
      } else Some(rows.iterator.map(_.getString(0)).filter(_ != null).toSeq)
      JoinPruneRule.probeCache.synchronized(JoinPruneRule.probeCache.put(ck, res))
      res
    }
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
