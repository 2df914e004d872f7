"""Empty-source behavior sweep — the reference asserts every operator
completes cleanly on an empty upstream (e.g. AccumulateSpec's empty-source
cases); here EVERY gate query runs against empty fixture tables and must
return an empty (or well-defined constant) result without raising.

Queries that read a concrete datum driver-side to parameterize themselves
(a query vector, k-means training sample) are exempt: their contract
requires a non-empty input by construction, like a reference stage built
from an element that doesn't exist.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry
from akka_stream_contrib_spark import tables

# need a concrete row driver-side before the plan exists
DATA_DEPENDENT = {
    "knn_label_vote",    # query vector = row 0's embedding
    "ann_cosine_topk",   # idem
    "ivf_ann_topk",      # k-means training sample
    "ann_all_topk",      # broadcast corpus matrix (np.stack of rows)
    "lateral_top_customers",  # registers views from the real sf dir
    # validates its fixed dense evaluation panel driver-side and raises
    # loudly when it is missing — an empty corpus IS the failure it guards
    "bootstrap_ci",
}
# rows expected even on empty tables: global-aggregate reductions (one
# NULL/zero row — standard SQL) and pure generators (seeded by literals,
# independent of any table)
NONEMPTY_OK = {
    "funnel_conversion", "last_element",        # single-row reductions
    "q6_forecast_revenue", "q14_promo_revenue",  # global aggs
    "q17_small_qty_revenue", "q19_disjunctive_revenue",
    "unfold_collatz", "feedback_fibonacci",      # literal-seeded generators
    "unfold_flow_with",                          # literal-seeded generator
    "data_quality_report",  # a zero-violation report row per check is correct
    "triangle_count",  # global (n_wedges, n_triangles) reduction — 1 zero row
    "classification_report",  # a one-row zero-count confusion report is correct
    "blocking_report",  # global 1-row audit aggregate — zero counts correct
    # round-6 session-2 single-row metric reductions: one all-NULL/zero
    # metrics row on empty input is standard aggregate semantics
    "auc_roc", "ks_statistic", "welch_ttest", "zipf_fit", "ndcg_eval",
    # r10 session-2: global single-row agreement reduction — one
    # zero-count/NULL-kappa row on empty input is standard agg semantics
    "fleiss_kappa",
    # benford emits its COMPLETE 9-digit spine (n=0, NULL χ² terms) by
    # design — an absent digit is the signal it audits for
    "benford_check",
    # round-7 single-row reductions: (n_keys=0, NULL gini),
    # (k, 0 hits, NULL ap), and (0 edges, NULL assortativity) are
    # standard aggregate semantics
    "gini_user_activity", "average_precision", "degree_assortativity",
    # session-2 round-7 single-row reductions: all-NULL agreement/
    # precision/BLEU metrics rows on empty input are standard aggregate
    # semantics (kappa/mrr/bleu each end in a 1-row combination)
    "cohen_kappa", "mrr_eval", "bleu_eval",
    # conformal/forecast: one all-NULL/zero metrics row on empty input
    # (aggregate-over-empty semantics, mirrored in the oracles)
    "conformal_interval", "forecast_eval",
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in tables.TABLE_NAMES:
        df = tables.load(spark, t, "/root/testdata/sf0.001")
        df.limit(0).write.parquet(os.path.join(str(d), f"{t}.parquet"))
    return str(d)


def test_every_query_handles_empty_tables(spark, empty_sf_dir):
    failures = {}
    for name, fn in entry.queries().items():
        if name in DATA_DEPENDENT:
            continue
        try:
            rows = fn(spark, empty_sf_dir).collect()
            if name not in NONEMPTY_OK and rows:
                failures[name] = f"expected no rows, got {len(rows)}"
        except Exception as ex:  # noqa: BLE001
            failures[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
    assert not failures, f"queries failing on empty input: {failures}"
