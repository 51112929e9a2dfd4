package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-keyed session memo — the single implementation of the contract
  * the pairs/train/plant memos each hand-rolled: values cached per
  * parameter key, guarded by PLAN EQUALITY on the canonicalized input
  * so a key collision can never serve another corpus's artifact (the
  * worst failure mode an engine-side cache can have), bounded to the
  * most recent `bound` plans per key so a long-lived session cycling
  * through inputs doesn't pin an unbounded set (evicted checkpointed
  * frames are freed by the ContextCleaner once unreferenced).
  *
  * Callers key by (session identity, params…); the stored value is
  * typically an eager localCheckpoint (reusable materialized rows) or
  * a driver-side trained model. [[graft.llm.Dedup]]'s rank-table memo
  * keeps its own structure — its prefix-reuse/extension semantics
  * don't fit a get-or-compute contract. */
private[graft] final class PlanMemo[K, V <: AnyRef](bound: Int = 4) {
  private val m = scala.collection.concurrent.TrieMap
    .empty[K, List[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, V)]]

  def getOrCompute(key: K, df: DataFrame)(compute: => V): V = {
    val plan = df.queryExecution.logical.canonicalized
    m.getOrElse(key, Nil)
      .collectFirst { case (p, v) if p.sameResult(plan) => v } match {
      case Some(v) => v
      case None =>
        val v = compute
        m.updateWith(key)(old =>
          Some(((plan, v) :: old.getOrElse(Nil)).take(bound)))
        v
    }
  }
}
