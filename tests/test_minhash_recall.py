"""MinHash LSH candidate quality, measured the way the ANN paths are
measured (tests/test_ann_recall.py): recall of the banded candidate
pairs against exact n-gram Jaccard ground truth, pinned with floors.

Design point: 8 permutations in 4 bands x 2 rows. The S-curve
P(candidate | J) = 1 - (1 - J^2)^4 gives 0.983 at the J=0.8 dedup
threshold and 0.68 at J=0.5 — permissive on the low side (candidates
are cheap; the exact verify join downstream removes them) and
near-complete where it must be. Measured on the synthetic corpus the
banding catches EVERY pair with J >= 0.5 at both sf0.01 and sf0.1
(recall 1.0); the floor is 0.9 to leave headroom for a testdata
redraw while catching a banding refactor that guts the S-curve.
"""

from __future__ import annotations

from monday_etl_automation_spark.plans.dedup_ops import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)

_RECALL_SF = "/root/testdata/sf0.01"  # same rationale as test_ann_recall
_J_THRESHOLD = 0.8


def test_minhash_candidate_recall_floor(spark):
    truth = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_pairs(spark, _RECALL_SF).collect()
        if r.n_shared / r.n_union >= _J_THRESHOLD
    }
    assert truth, "ground truth is empty — corpus lost its near-dup pairs"
    cand = {
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_candidates(spark, _RECALL_SF).collect()
    }
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, f"MinHash candidate recall {recall:.3f} below floor"


def test_minhash_candidates_not_vacuous(spark):
    """Recall 1.0 must not come from emitting (nearly) all pairs: the
    candidate set has to stay a tiny fraction of n^2/2 or the banded
    join has degenerated into the all-pairs scan it exists to avoid."""
    from monday_etl_automation_spark.sources.tables import load_table

    n_docs = load_table(spark, _RECALL_SF, "documents").count()
    n_cand = minhash_lsh_candidates(spark, _RECALL_SF).count()
    all_pairs = n_docs * (n_docs - 1) / 2
    assert n_cand <= 0.02 * all_pairs, (
        f"{n_cand} candidates is {n_cand / all_pairs:.1%} of all pairs"
    )
