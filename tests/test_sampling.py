"""Deterministic sampling / mixture-rebalance operators (q74/q75).

Properties pinned here:
- bottom-k is mergeable (the scale contract): bottom-k of a union equals
  bottom-k over the parts' bottom-k's;
- Spark plans the rank<=k filter as WindowGroupLimit, i.e. map-side
  partial top-k BEFORE the shuffle;
- mixture_rebalance keep counts track min(1, target*N/N_g) per group,
  the keep-all sentinel and missing-group drop paths work, and
  membership is content-stable (growing the corpus never flips a
  surviving group's existing members out at equal thresholds).
"""

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.text_analysis import (
    mixture_rebalance,
    stratified_bottom_k,
)


def _docs(spark, n, langs=("en", "de")):
    rows = [(i, langs[i % len(langs)]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_bottom_k_deterministic_and_sized(spark):
    df = _docs(spark, 200)
    a = stratified_bottom_k(df, ["lang"], "doc_id", k=7, salt="s")
    b = stratified_bottom_k(df, ["lang"], "doc_id", k=7, salt="s")
    ra = sorted((r.lang, r.doc_id, r.sample_rank) for r in a.collect())
    rb = sorted((r.lang, r.doc_id, r.sample_rank) for r in b.collect())
    assert ra == rb
    per_lang = {}
    for lang, _, rk in ra:
        per_lang.setdefault(lang, []).append(rk)
    for lang, rks in per_lang.items():
        assert sorted(rks) == list(range(1, 8)), lang


def test_bottom_k_salt_changes_sample(spark):
    df = _docs(spark, 200)
    a = {r.doc_id for r in stratified_bottom_k(df, ["lang"], "doc_id", 7, "s1").collect()}
    b = {r.doc_id for r in stratified_bottom_k(df, ["lang"], "doc_id", 7, "s2").collect()}
    assert a != b


def test_bottom_k_mergeable(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    property that lets map tasks keep local bottom-k before the shuffle."""
    df = _docs(spark, 300)
    part_a = df.filter(F.col("doc_id") < 150)
    part_b = df.filter(F.col("doc_id") >= 150)
    direct = stratified_bottom_k(df, ["lang"], "doc_id", 9, "m")
    ka = stratified_bottom_k(part_a, ["lang"], "doc_id", 9, "m").drop("sample_rank")
    kb = stratified_bottom_k(part_b, ["lang"], "doc_id", 9, "m").drop("sample_rank")
    merged = stratified_bottom_k(ka.unionByName(kb), ["lang"], "doc_id", 9, "m")
    assert sorted((r.lang, r.doc_id, r.sample_rank) for r in direct.collect()) == \
        sorted((r.lang, r.doc_id, r.sample_rank) for r in merged.collect())


def test_bottom_k_plans_window_group_limit(spark):
    """The rank<=k filter must appear as WindowGroupLimit in the physical
    plan (Spark's partial top-k pushdown) — this is the reason the
    exchange carries O(k x strata) rows instead of the corpus."""
    df = _docs(spark, 100)
    plan = (
        stratified_bottom_k(df, ["lang"], "doc_id", 5, "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_mixture_rebalance_counts_and_paths(spark):
    # 400 en / 80 de / 120 fr; targets: en 250 (over -> partial),
    # de 400 (under -> keep-all), fr absent (drop)
    rows = (
        [(i, "en") for i in range(400)]
        + [(1000 + i, "de") for i in range(80)]
        + [(2000 + i, "fr") for i in range(120)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept, thr = mixture_rebalance(df, "lang", "doc_id", {"en": 250, "de": 400}, "z")
    got = {r.lang: r for r in thr.collect()}
    n_total = 600
    assert got["en"].keep_micro == (1000 * 250 * n_total) // 400  # 375000
    assert got["de"].keep_micro == 1_000_000  # min() clamp: 3_000_000 -> cap
    assert got["fr"].keep_micro == 0
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("fr", 0) == 0
    assert counts["de"] == 80  # keep-all sentinel
    # partial keep: binomial(400, 0.375) stays well inside [100, 200]
    assert 100 <= counts["en"] <= 200, counts["en"]


def test_mixture_rebalance_membership_stable_under_growth(spark):
    """With thresholds held equal, a doc kept in the small corpus is kept
    in the grown corpus: membership is a pure per-row hash rule, so only
    the per-group THRESHOLD moves as counts drift — never the identity of
    rows under an unchanged threshold."""
    small = _docs(spark, 100, langs=("en",))
    big = _docs(spark, 200, langs=("en",))
    # same target for both => same keep fraction (single group, target 500)
    kept_s, _ = mixture_rebalance(small, "lang", "doc_id", {"en": 500}, "g")
    kept_b, _ = mixture_rebalance(big, "lang", "doc_id", {"en": 500}, "g")
    s = {r.doc_id for r in kept_s.collect()}
    b = {r.doc_id for r in kept_b.collect()}
    assert s == {d for d in b if d < 100}


def test_mixture_rebalance_big_table_map_side_only(spark):
    """The documents side must not shuffle: the only exchanges in the
    plan belong to the tiny counts aggregation, and the join back is a
    broadcast."""
    df = _docs(spark, 500)
    kept, _ = mixture_rebalance(df, "lang", "doc_id", {"en": 500, "de": 500}, "p")
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_accounting(spark):
    # hand-computable corpus: one group, budget 10, token counts chosen to
    # exercise exact-fit, straddle, and multi-pack-straddle paths
    #   doc 0: 4 tok  -> spans [0,4)   pack 0
    #   doc 1: 6 tok  -> spans [4,10)  pack 0 (exact fit, NOT a straddler)
    #   doc 2: 3 tok  -> spans [10,13) pack 1
    #   doc 3: 25 tok -> spans [13,38) pack 1, straddles into packs 2-3
    #   doc 4: 2 tok  -> spans [38,40) pack 3 (exact end)
    from text_similarity_node_spark.operators.text_analysis import (
        sequence_packing,
    )

    rows = [(0, 4), (1, 6), (2, 3), (3, 25), (4, 2)]
    df = spark.createDataFrame(rows, "doc_id long, n long").withColumn(
        "g", F.lit("en")
    )
    out = sequence_packing(df, ["g"], "doc_id", F.col("n"), budget=10)
    got = {
        (r.g, r.pack_id): (r.n_docs, r.n_tokens, r.n_straddlers)
        for r in out.collect()
    }
    assert got == {
        ("en", 0): (2, 10, 0),
        ("en", 1): (2, 28, 1),
        ("en", 3): (1, 2, 0),
    }


def test_sequence_packing_groups_independent(spark):
    from text_similarity_node_spark.operators.text_analysis import (
        sequence_packing,
    )

    rows = [(i, 7, "en" if i % 2 else "de") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n long, g string")
    out = sequence_packing(df, ["g"], "doc_id", F.col("n"), budget=16)
    # each group: 20 docs x 7 tok = 140 tokens -> packs 0..8; totals conserved
    per_g = (
        out.groupBy("g")
        .agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t"))
        .collect()
    )
    assert {(r.g, r.d, r.t) for r in per_g} == {("en", 20, 140), ("de", 20, 140)}
    # sharding the group key parallelizes without changing in-shard packing:
    # (g, shard) packing of shard-disjoint docs == per-shard packing of each
    sharded = df.withColumn("shard", (F.col("doc_id") % 4).cast("long"))
    out2 = sequence_packing(
        sharded, ["g", "shard"], "doc_id", F.col("n"), budget=16
    )
    tot = out2.agg(F.sum("n_docs"), F.sum("n_tokens")).collect()[0]
    assert (tot[0], tot[1]) == (40, 280)
