package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Catalog-wide plan audit: no query may plan a CartesianProduct or
  * BroadcastNestedLoopJoin unless it is on the documented allow-list of
  * deliberately bounded shapes — a new catalog entry that accidentally
  * drops its equi key fails here instead of at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestSession {

  /** Queries whose non-equi/cross shapes are deliberate AND caller-bounded:
    * q10 band join (pure theta → BNLJ over a literal band table), ext02
    * (broadcast query set × corpus — the exact-kNN contract), ext03/ext18
    * (all-pairs verify stage, input bounded by contract), the N-scalar
    * cross joins of ext13/ext15-derived shapes, ext25/ext30/ext35 (their
    * totals sides are 1-row aggregates — always broadcast-safe), and the
    * recall harnesses joining two ≤|Q|·k frames. ext19 is deliberately NOT
    * listed: it has no join at all, and must stay that way
    * (PlanRegressionSpec pins it too).
    */
  private val allowed = Set(
    "q10_band_join", "ext02_knn_cosine", "ext03_jaccard_pairs",
    "ext07_embed_neardup", "ext12_ann_lsh", "ext13_tfidf", "ext14_ann_ivf",
    "ext15_neardup_pipeline", "ext16_ann_lsh_recall", "ext17_ann_ivf_recall",
    "ext18_ngram_jaccard", "ext25_temperature_mix", "ext30_shard_balance",
    "ext35_bigram_pmi",
    // 1-row scalar sides (total-count / vocab-size) — always broadcast-safe
    "ext40_heavy_hitters", "ext44_ngram_lm", "ext49_perplexity_buckets",
    // ext52: the totals side of the bucket-ratio table is a 1-row aggregate
    // (the ratio table itself is ≤1024 rows and joins equi — see Dsir)
    "ext52_dsir_weights",
    // ext55: ext02's broadcast query set × the gated corpus
    "ext55_curated_knn",
    // ext60/ext64: ext02's broadcast query set × corpus contract (MMR's
    // pool comes from bruteForceTopK; everything downstream is equi or
    // bounded by poolK); ext62: the recall harness's exact side is
    // bruteForceTopK — the IVF-PQ side itself joins equi on list/id
    "ext60_hard_negatives", "ext64_mmr_diversify", "ext62_ann_ivfpq_recall",
    // ext88: ext62's recall-harness shape on the mutated index — the exact
    // side is bruteForceTopK (broadcast ≤|Q| queries × corpus), the
    // IVF-PQ side joins equi on list/id
    "ext88_ann_recall_after_mutation",
    // ext70: two 1-row scalar cross joins (corpus totals + weight
    // normalizer) — always broadcast-safe
    "ext70_doremi_weights",
    // ext78/ext79: the retrieval-eval harnesses rank ext02's
    // broadcast-query brute-force top-k
    "ext78_retrieval_eval", "ext79_ndcg",
    // ext89/ext90: 1-row scalar sides (corpus token total / snapshot
    // totals + the folded PSI scalar) — always broadcast-safe
    "ext89_source_kl", "ext90_embedding_drift",
    // ext93: 1-row corpus-stats scalar (N, total length) cross-joined onto
    // the scored postings; ext94/ext96: 1-row node-count / dangling-mass /
    // L1-norm scalars cross-joined onto the score frame each iteration —
    // always broadcast-safe
    "ext93_bm25_topk", "ext94_pagerank", "ext96_hits",
    // ext99: each referential rule joins its table's 1-row total with the
    // 1-row anti-join violation count; ext100: the funnel assembles five
    // 1-row stage counts into one row — always broadcast-safe
    "ext99_data_contract", "ext100_curation_funnel",
    // ext108: the delivery/existing split point is a 1-row max-id
    // aggregate cross-joined onto the fingerprint table — always
    // broadcast-safe (the dedup joins themselves are banded equi-joins,
    // pinned by ImageDedupSpec's recall tests)
    "ext108_image_incremental_dedup")

  // NOTE: building a catalog entry is not always free — iterative operators
  // (ext54/ext61-63's k-means/PQ/GD training) must RUN their driver-held
  // training loops before a final plan exists. That cost is inherent to
  // auditing the real plan the driver gate executes, and stays bounded at
  // the audit's sf0.001. eagerLifecycle entries are EXCLUDED, not paid:
  // their build executes whole streaming/store arcs only to return a
  // local/checkpointed summary frame whose executed plan can never
  // contain a join shape — zero audit value for minutes of lifecycle
  // work. Their inner join shapes are pinned by their own operator specs
  // (FingerprintStoreSpec, ImageIngestSpec, WatchlistMonitorSpec,
  // CorpusIngestSpec), and SparkEntrySpec smokes the entries themselves.
  test("no undeclared CartesianProduct / BroadcastNestedLoopJoin in the catalog") {
    val offenders = SparkEntry.all.filterNot(_.eagerLifecycle).flatMap { q =>
      val plan =
        try q.build(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: ${e.getMessage}") }
      val bad = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
      if (bad && !allowed.contains(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"undeclared non-equi join shapes in: $offenders")
  }
}
