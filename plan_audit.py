"""Physical-plan audit across every driver query (scale-discipline gate).

Executes each ``queries()`` entry at a small scale factor with AQE on,
captures the FINAL adaptive plan (``isFinalPlan=true`` — what actually ran,
not the pre-AQE guess), and greps it for the anti-patterns that sink a
100-TB run long before correctness does:

* ``CartesianProduct`` — an unbroadcast cross join.  HARD FAILURE unless
  the query is annotated: at cluster scale this is O(n^2) shuffle-side
  work no matter how fast the kernels are.  (The repo's intentional
  cross joins — one-row aggregate sides in the recall audits, document
  frequency totals — must resolve to ``BroadcastNestedLoopJoin`` under
  AQE; if one ever degrades back to CartesianProduct this gate trips.)
* ``BroadcastNestedLoopJoin`` — legitimate ONLY when the broadcast side
  is a one-row aggregate or an audit-scale truth set.  Queries where
  that is by design carry an annotation; a BNLJ appearing in an
  unannotated query is reported as NEEDS-REVIEW (soft, because the
  pattern is fine when the build side is provably tiny, and plan text
  alone cannot prove size).
* Shuffle-exchange count per query — not a failure, but recorded in the
  report so a refactor that silently doubles a query's exchanges shows
  up in the diff of ``docs/PLAN_AUDIT.md``.

Usage:
    python plan_audit.py [--sf /root/testdata/sf0.001] [--only q16,q37]

Writes ``docs/PLAN_AUDIT.md`` and exits non-zero on any hard failure.
The per-query relative timings here are NOT benchmarks (tiny sf,
collect-to-driver); ``bench.py`` owns timing.
"""

from __future__ import annotations

import argparse
import sys
import time

# Queries whose plans legitimately contain BroadcastNestedLoopJoin: every
# entry names the tiny broadcast side that makes the pattern safe at scale.
BNLJ_OK = {
    "q06_token_stats": "one-row corpus-total aggregate joined to per-lang rows",
    "q31_simhash_recall_audit": "one-row truth/missed counts (audit-scale by design)",
    "q35_minhash_recall_audit": "one-row truth/missed counts (audit-scale by design)",
    "q36_ann_lsh_recall_audit": "one-row truth/missed counts (audit-scale by design)",
    "q40_benchmark_contamination": "broadcast benchmark table (small by contract)",
    "q15_langid": "broadcast per-language stopword profile (constant-size)",
    "q62_unigram_nll_quality": "one-row vocabulary-mass total",
    "q61_tfidf_cosine_pairs": "one-row doc-count total for idf",
    "q73_tfidf_weighted_jaccard": "one-row doc-count total for idf",
    "q76_wminhash_recall_audit": "one-row truth/missed counts (audit-scale by design)",
    "q64_hll_vocab_audit": "one-row exact-distinct vs sketch-estimate comparison",
    "q77_percentile_sketch_audit": "one-row sketch-vs-exact quantile comparison",
    "q83_dedup_savings": "one-row corpus-mass totals per tier",
    "q92_minhash_estimator_audit": "one-row estimator-error aggregate",
    "q94_cluster_quality": "one-row corpus aggregate for cluster-quality rates",
    "q19_ann_lsh": "broadcast query-vector side (small Q by contract)",
    "q10_embedding_cosine_topk": "broadcast query-vector side (small Q by contract)",
    "q33_ann_ivf": "broadcast centroid table (n_lists rows)",
    "q59_ann_quantized": "broadcast centroid/query side (small by contract)",
    "q60_semantic_dedup": "broadcast centroid table (n_lists rows)",
    "q80_bloom_contamination": "broadcast bloom bitset (fixed-size array)",
    "q89_bpe_token_stats": "one-row corpus totals for rates",
    "q90_crosscorpus_dedup": "one-row snapshot-mass totals",
    "q93_threshold_sweep": "broadcast threshold grid (constant rows)",
    "q75_mixture_rebalance": "one-row corpus total + per-group keep "
    "thresholds (<= n_groups rows) broadcast back over documents",
    "q113_minhash_merge_audit": "lang-level merged-sketch self-join "
    "(<= n_langs rows by construction) under an inequality predicate",
}

# Queries allowed to contain CartesianProduct in the FINAL plan.  Empty on
# purpose: nothing in the repo needs one.  Add entries only with a reason.
CARTESIAN_OK: dict[str, str] = {}


def explain_final(spark, df) -> str:
    qe = df._jdf.queryExecution()
    return spark._jvm.PythonSQLUtils.explainString(qe, "simple")


def audit(sf_dir: str, only: list[str] | None) -> int:
    from text_similarity_node_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="tsn-plan-audit", cores=8, shuffle_partitions=8)
    qmap = entry.queries()
    names = sorted(qmap) if not only else [n for n in sorted(qmap) if n in only]
    rows_out = []
    failures = []
    reviews = []
    for name in names:
        t0 = time.time()
        try:
            df = qmap[name](spark, sf_dir)
            n = len(df.collect())  # forces AQE to finalize every subtree
            plan = explain_final(spark, df)
        except Exception as exc:  # noqa: BLE001 - report, don't abort the sweep
            failures.append((name, f"EXECUTION ERROR: {exc}"))
            rows_out.append((name, -1, -1, -1, -1, -1, -1, "ERROR"))
            continue
        dt = time.time() - t0
        cart = plan.count("CartesianProduct")
        shuf = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        bcast = plan.count("BroadcastExchange")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        imts = plan.count("InMemoryTableScan")
        note = ""
        if cart and name not in CARTESIAN_OK:
            failures.append((name, f"{cart}x CartesianProduct in final plan"))
            note = "FAIL: CartesianProduct"
        elif bnlj and name not in BNLJ_OK:
            reviews.append((name, f"{bnlj}x BroadcastNestedLoopJoin unannotated"))
            note = "review: BNLJ"
        elif bnlj:
            note = BNLJ_OK[name]
        if imts and not note:
            note = "iterative/persisted: textual counts reprint cached subtrees"
        rows_out.append((name, n, shuf, bcast, bnlj, cart, imts, note))
        print(
            f"[plan-audit] {name}: rows={n} shuffles={shuf} bcast={bcast} "
            f"bnlj={bnlj} cartesian={cart} imts={imts} ({dt:.1f}s)",
            file=sys.stderr,
            flush=True,
        )

    lines = [
        "# Plan audit — final adaptive plans, every driver query",
        "",
        f"Input: `{sf_dir}` (plan-shape audit; timings are not benchmarks).",
        "Each query was EXECUTED with AQE on and its final plan "
        "(`isFinalPlan=true`) inspected — this is what the cluster would "
        "run, after runtime join re-selection, not the optimizer's "
        "pre-execution guess.",
        "",
        "Hard gate: `CartesianProduct` in a final plan fails the audit "
        "(allowlist empty on purpose). `BroadcastNestedLoopJoin` must be "
        "annotated with the tiny broadcast side that makes it safe; "
        "unannotated BNLJs are flagged for review.  Shuffle/broadcast "
        "counts are recorded so plan regressions show up as diffs of "
        "this file.",
        "",
        "Shuffle/broadcast counts are TEXTUAL occurrences in the final plan "
        "string.  Iterative queries (connected components, suffix-array "
        "doubling) and multi-consumer pipelines reprint persisted subtrees "
        "once per reference, so their counts overstate executed exchanges — "
        "the `cached scans` column flags those rows; treat their shuffle "
        "number as a diff-stability signal, not an executed-exchange count.",
        "",
        "| query | rows | shuffles | broadcasts | BNLJ | cartesian | cached scans | note |",
        "|---|---|---|---|---|---|---|---|",
    ]
    table = {
        name: f"| {name} | {n} | {shuf} | {bcast} | {bnlj} | {cart} | {imts} | {note} |"
        for name, n, shuf, bcast, bnlj, cart, imts, note in rows_out
    }
    if only:
        # Partial (--only) runs MERGE into the existing table instead of
        # clobbering the full-sweep report (the q118-only run once replaced
        # the whole 95-query table with one row).
        try:
            with open("docs/PLAN_AUDIT.md") as fh:
                for ln in fh:
                    if ln.startswith("| q") and not ln.startswith("| query |"):
                        prior = ln.rstrip("\n").split(" | ")[0].lstrip("| ")
                        table.setdefault(prior, ln.rstrip("\n"))
        except FileNotFoundError:
            pass
    lines.extend(table[k] for k in sorted(table))
    lines.append("")
    if failures:
        lines.append("## FAILURES")
        lines.extend(f"- **{n}**: {m}" for n, m in failures)
    if reviews:
        lines.append("## Needs review")
        lines.extend(f"- {n}: {m}" for n, m in reviews)
    if not failures and not reviews:
        lines.append(
            "All plans clean: no CartesianProduct anywhere; every "
            "BroadcastNestedLoopJoin is an annotated tiny-side pattern."
        )
    lines.append("")
    with open("docs/PLAN_AUDIT.md", "w") as fh:
        fh.write("\n".join(lines))
    print(
        f"[plan-audit] {len(rows_out)} queries, {len(failures)} failures, "
        f"{len(reviews)} review flags -> docs/PLAN_AUDIT.md",
        file=sys.stderr,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s] or None
    raise SystemExit(audit(args.sf, only))
