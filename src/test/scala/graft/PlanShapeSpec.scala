package graft

/** Plan-shape regression guard over the ENTIRE query registry: no
  * query may plan a single-partition exchange or an all-pairs join
  * unless it is on the documented exception list with a reason. A new
  * operator that accidentally funnels through one task or falls back
  * to a nested-loop join fails here before it ships. Plans are built,
  * not executed — the whole sweep costs seconds. */
class PlanShapeSpec extends SparkSpec {

  /** Documented exceptions (query → why the shape is correct). */
  private val allowedSinglePartition = Map(
    "a3_global_minmax" ->
      "global aggregate: parallel partials, one-row final combine",
    "o1_o3_topk" ->
      "global top-k: TakeOrdered / one-row-per-partition final",
    "o3_first_where_cum_ge" ->
      "reference per-pool cumulative selection; bounded rows (VERDICT r3)",
    "o5_slice" ->
      "reference global row_number slice; bounded rows",
    "v3_liquidity_distribution" ->
      "single-pool reference pipeline; <= 2*MAX_TICK/ts rows; fleet form is createLiqBy/swapDFBy",
    "v3_price_series_asof" ->
      "single-pool resampled series; bounded buckets; keyless escape hatch is asofJoinRanged",
    "v3_price_series_gas" ->
      "single-pool resampled series; bounded buckets",
    "llm_mixture_upsample" ->
      "epoch plan: |sources|-row aggregate to a one-row total; corpus side only broadcast-joins the plan",
    "llm_mixture_temperature" ->
      "allocation plan: |languages|-row aggregate to a one-row normalizing total; no corpus side at all",
    "llm_corpus_diff" ->
      "one-row totals aggregate (parallel vocab-keyed partials) + per-side global top-k",
    "llm_sample_weighted" ->
      "one-row total-weight aggregate (parallel partials); corpus side stays a narrow filter",
    "o6_zorder_layout" ->
      "one-row min/max bounds aggregate (parallel partials); corpus side stays a narrow integer projection",
    "llm_nb_train" ->
      "one-row class-totals aggregate over the width-row dense model (parallel partials); corpus side is one keyed count",
    "llm_nb_classify" ->
      "one-row totals + one-row prior aggregates; corpus side is the keyed feature count + broadcast-model score join",
    "a15_join_size_sketch" ->
      "one-row estimator outputs (lane-min, side counts, exact check) over 4xwidth-row registers; corpus side is two keyed register aggregates",
    "s9_integrity_audit" ->
      "three one-row check aggregates (parallel partials) unioned into the 3-row report; corpus side is anti-join + keyed counts",
    "s11_time_travel" ->
      "two one-row snapshot digests (count/sum/min/max global aggregates, map-side partials) unioned into the 2-row report; the pinned scans themselves stay partitioned",
    "llm_truncation_report" ->
      "one-row corpus digest (|lengths| conditional sums in ONE global aggregate, map-side partials) exploded into the |lengths|-row report")

  private val allowedAllPairs = Map(
    "llm_similarity_topk" ->
      "brute-force cosine baseline: exhaustive by definition, queries broadcast",
    "llm_similarity_quantized_topk" ->
      "brute-force retrieval over int8 codes: same deliberate baseline shape",
    "llm_similarity_recall_eval" ->
      "contains the exact brute-force baseline BY DESIGN (recall is measured against it); the approximate side is the IVF list equi-join",
    "llm_similarity_recall_pq" ->
      "contains the exact brute-force baseline BY DESIGN (recall is measured against it); the approximate side is full-corpus ADC scoring (flat-PQ, see llm_similarity_pq_topk)",
    "llm_similarity_recall_ivfpq" ->
      "contains the exact brute-force baseline BY DESIGN (recall is measured against it); the approximate side is the IVF list equi-join + ADC scoring",
    "llm_similarity_pq_topk" ->
      "full-corpus ADC scoring (PQ without coarse pruning — FAISS's flat-PQ mode); the pruned path is llm_similarity_ivfpq's list equi-join",
    "llm_mixture_upsample" ->
      "one-row total joined onto the |sources|-row plan (scalar join); corpus side never all-pairs",
    "llm_mixture_temperature" ->
      "one-row normalizing total joined onto the |languages|-row plan (scalar join)",
    "v3_liquidity_surface" ->
      "display grid: |frames| x |active ticks| densification (animation frames are driver-small by construction); the event side is keyed aggregation only",
    "llm_corpus_diff" ->
      "one-row totals broadcast-joined onto the vocabulary (scalar join); the token stream is keyed aggregation only",
    "llm_sample_weighted" ->
      "one-row total broadcast-joined onto the corpus (scalar join); the draw itself is a narrow filter",
    "o6_zorder_layout" ->
      "one-row bounds broadcast-joined onto the corpus (scalar join); tiles aggregate keyed on file_id",
    "llm_nb_train" ->
      "one-row totals broadcast-joined onto the width-row model (scalar join)",
    "llm_nb_classify" ->
      "one-row totals/prior broadcast-joined onto model and per-doc scores (scalar joins)",
    "a15_join_size_sketch" ->
      "three one-row frames cross-joined into the single output row (scalar joins); registers never all-pairs")

  test("no registry query plans an undocumented single-partition exchange or all-pairs join") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val bad = Seq.newBuilder[String]
      if (plan.contains("Exchange SinglePartition") &&
          !allowedSinglePartition.contains(name))
        bad += s"$name: Exchange SinglePartition"
      if ((plan.contains("CartesianProduct") ||
           plan.contains("BroadcastNestedLoopJoin")) &&
          !allowedAllPairs.contains(name))
        bad += s"$name: all-pairs join"
      bad.result()
    }
    assert(violations.isEmpty,
      s"undocumented plan shapes:\n${violations.mkString("\n")}")
  }

  test("the memoized plant chain's UNCACHED plan stays clean (checkpoint hides it from the sweep above)") {
    // withPlantedEverything serves an eager localCheckpoint, so the
    // registry rows' plans start at Scan ExistingRDD and a regression
    // inside the plant chain (an unkeyed window, an all-pairs join)
    // would execute invisibly; sweep the uncached builder directly
    val plan = graft.llm.Curation.plantedEverythingUncached(
        graft.Tables.documents(spark, "/root/testdata/sf0.001"),
        "text", "doc_id", 10, 924000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "plant chain funnels through a single partition")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "plant chain plans an all-pairs join")
  }
}
