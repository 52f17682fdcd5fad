package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.Tables

/** Injected optimizer rule: pin the BROADCAST strategy onto any join
  * side built ONLY from the schema-constant dimension tables (nation:
  * 25 rows, region: 5 rows — bounded by the schema at every scale
  * factor, TPC-H spec §4.2.3).
  *
  * Why a rule and not stats: size-based broadcast selection needs
  * accurate stats at planning time — freshly-landed dims have none, and
  * `autoBroadcastJoinThreshold = -1` (a common defensive setting on
  * shared clusters) disables the stats path entirely. A dimension whose
  * cardinality is bounded by the SCHEMA is safe to broadcast under any
  * configuration, so the engine pins it once here instead of asking
  * every query author to remember the `broadcast()` hint — the same
  * decision TpchQueries makes per-query, promoted to session scope for
  * pure-SQL users.
  *
  * Mechanics: a join side qualifies when every leaf below it carries
  * exactly the nation or region schema (a Project/Filter/dim⋈dim
  * subtree over those scans still qualifies — e.g. the Q5 nation⋈region
  * chain). An existing hint on that side is respected (the rule only
  * fills empty hints, so NO_BROADCAST etc. still win). The rule runs in
  * the operator-optimization batch; the physical planner consumes the
  * hint exactly as it would a user-written one.
  */
object PinnedDimBroadcast extends Rule[LogicalPlan] {

  private val nationCols = Tables.nationSchema.fieldNames.toSet
  private val regionCols = Tables.regionSchema.fieldNames.toSet

  private def pinnedDimOnly(p: LogicalPlan): Boolean = {
    val leaves = p.collectLeaves()
    leaves.nonEmpty && leaves.forall { l =>
      val cols = l.output.map(_.name).toSet
      cols == nationCols || cols == regionCols
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, _, hint) =>
      val lh = hint.leftHint.orElse(
        if (pinnedDimOnly(left)) Some(HintInfo(strategy = Some(BROADCAST)))
        else None)
      val rh = hint.rightHint.orElse(
        if (pinnedDimOnly(right)) Some(HintInfo(strategy = Some(BROADCAST)))
        else None)
      if ((lh eq hint.leftHint) && (rh eq hint.rightHint)) j
      else j.copy(hint = JoinHint(lh, rh))
  }
}
