"""Text analysis operators for training-data pipelines.

All pure Column expressions (JVM, codegen) — language id, quality scoring,
token counting, fingerprinting.  The langid heuristic is a marker-word
scorer with a fixed, documented priority order so results are deterministic
and SQL-expressible for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# marker words per language, fixed order = deterministic tie-break priority
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")


def _marker_hits(tokens: Column, lang: str) -> Column:
    markers = list(LANG_MARKERS[lang])
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def predict_lang(tokens: Column) -> Column:
    """argmax of marker hits with fixed priority tie-break; 'und'
    (undetermined) when no marker hits at all."""
    scores = {lang: _marker_hits(tokens, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed priority CASE: earlier langs win ties
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def langid_sql_case(text_expr: str = "text") -> str:
    """The DuckDB-equivalent SQL of predict_lang (kept adjacent so the two
    can't drift)."""
    def hits(lang: str) -> str:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            f"len(list_filter(regexp_extract_all({text_expr}, '\\w+'),"
            f" t -> t IN ({markers})))"
        )

    score_cols = {lang: hits(lang) for lang in LANG_PRIORITY}
    greatest = "greatest(" + ", ".join(score_cols.values()) + ")"
    case = f"CASE WHEN {greatest} = 0 THEN 'und'"
    for lang in LANG_PRIORITY:
        case += f" WHEN {score_cols[lang]} = {greatest} THEN '{lang}'"
    case += " ELSE 'und' END"
    return case


def word_shingles(tokens: Column, n: int) -> Column:
    """Sliding word n-grams as space-joined strings; empty array when the
    doc has fewer than n words.  Pure JVM (sequence + transform + slice) —
    no Python workers in the shingle path."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_check(
    docs,
    bench,
    id_col: str,
    text_col: str,
    n: int = 13,
    broadcast_bench: bool = True,
):
    """Benchmark decontamination (the GPT-3-style 13-gram rule): flag every
    doc sharing at least one word n-gram with the benchmark set; returns
    (id, n_contaminated_grams) for contaminated docs only.

    Scale shape: the benchmark gram set is reduced to DISTINCT xxhash64
    values (8 bytes each — a benchmark suite is thousands of docs, so the
    set is MBs) and broadcast; the corpus streams through a broadcast hash
    semi-join with NO shuffle of corpus grams.  ``broadcast_bench=False``
    falls back to a shuffle hash join for benchmark sets too large to
    broadcast.  Matching on xxhash64 of the gram (8-byte keys instead of
    ~80-byte strings) admits ~2^-64-per-pair collisions; a collision can
    only over-flag, and at that rate is tolerated by every production
    decontamination pipeline that runs on hashes."""
    from ..functions import columns as C

    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_shingles(C.word_tokens(F.col(text_col)), n)).alias("_g"),
    ).select(id_col, F.xxhash64("_g").alias("_gh")).distinct()
    bench_grams = (
        bench.select(
            F.explode(word_shingles(C.word_tokens(F.col(text_col)), n)).alias("_g")
        )
        .select(F.xxhash64("_g").alias("_gh"))
        .distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, "_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


def hash_split(id_col: Column, train_fraction: float = 0.9, salt: str = "") -> Column:
    """Deterministic, content-stable train/val assignment: the first two
    hex chars of md5(salt || id) give 256 uniform buckets; the id lands in
    'train' iff its bucket string sorts below the threshold bucket.  The
    lexicographic compare on fixed-width lowercase hex deliberately avoids
    engine-specific hex->int conversion, so the exact same rule is
    expressible in any SQL dialect (the q42 DuckDB oracle uses the literal
    CASE translation).  Salting re-rolls the split without touching ids;
    stability under corpus growth (a doc's split never depends on other
    rows) is what makes the op safe to run incrementally at ingest — no
    shuffle, no state, pure map-side."""
    buckets = int(round(train_fraction * 256))
    thr = format(buckets, "02x")
    h = F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 2)
    return F.when(h < F.lit(thr), F.lit("train")).otherwise(F.lit("val"))


EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"


def redact_emails(text: Column) -> Column:
    """Replace every email-shaped span with '<EMAIL>'.  The pattern keeps
    to character classes and '+' so Java regex (Spark) and RE2 (DuckDB)
    agree byte-for-byte — the q44 oracle runs the identical pattern.
    Map-side only: PII scrubbing composes with any scan."""
    return F.regexp_replace(text, EMAIL_RE, "<EMAIL>")


def email_count(text: Column) -> Column:
    """Number of email-shaped spans (size of regexp_extract_all)."""
    return F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))


def micro_frac(num: Column, den: Column) -> Column:
    """floor(num * 1e6 / den) as BIGINT — the integer channel used for
    every oracle-hashed fraction (floor of a double ratio is exact for
    numerators < 2^53, and DuckDB's integer ``//`` computes the same
    value, so the two engines agree bit-for-bit)."""
    return F.when(
        den > 0, F.floor(num.cast("double") * 1_000_000 / den)
    ).otherwise(F.lit(0)).cast("long")


def repetition_stats(tokens: Column) -> tuple[Column, Column]:
    """Gopher-style repetition signals: (dup_word_frac_micro, total_words).
    dup fraction = 1 - distinct/total over word tokens, as an integer
    micro-fraction.  Map-side only; the top-n-gram fraction (which needs a
    per-doc argmax over exploded grams) lives in q43's grouped plan."""
    total = F.size(tokens)
    nd = F.size(F.array_distinct(tokens))
    return micro_frac(total - nd, total), total


def stratified_bottom_k(
    df,
    strata_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "",
):
    """Deterministic per-stratum uniform sample: keep the ``k`` rows whose
    ``md5(salt || id)`` sorts lowest within each stratum (a bottom-k
    sketch).  Because the rank key is a content hash, the sample is (a)
    uniform within the stratum, (b) reproducible across runs and engines,
    and (c) mergeable — the bottom-k of a union is computable from the
    bottom-k of the parts, which is exactly what Spark exploits at scale:
    the ``row_number() <= k`` filter is rewritten to a WindowGroupLimit,
    so every map task keeps only its local bottom-k BEFORE the shuffle
    and the exchange carries O(k × strata), not the corpus
    (tests/test_sampling.py pins the WindowGroupLimit node in the plan).
    The reference has no sampling surface (single-pair kernels,
    /root/reference/src/similarity.cpp); this is pipeline machinery a
    100-TB corpus needs before any expensive audit pass.

    Returns ``df``'s rows (plus ``sample_rank``) for the kept sample.
    Ties on the full md5 of distinct ids are not a practical concern, but
    ``id_col`` is appended to the ordering so the rule is total anyway.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(h.asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mixture_rebalance(
    df,
    group_col: str,
    id_col: str,
    target_milli: dict[str, int],
    salt: str = "",
):
    """Corpus mixture rebalancing (the DoReMi/data-mixing stage): given
    target corpus shares per group in permille, compute each group's keep
    fraction from its MEASURED count and keep a deterministic
    hash-thresholded subset, so the surviving corpus approaches the
    target mixture without ever exceeding any group's population.

    keep_frac(g) = min(1, (target_milli[g]/1000) * N_total / N_g),
    carried end-to-end in exact BIGINT arithmetic:

        keep_micro = least(1_000_000, 1000 * target_milli * N_total // N_g)
        thr_24bit  = keep_micro * 16_777_216 // 1_000_000
        keep row   iff substring(md5(salt || id), 1, 6) < lpad(hex(thr), 6)

    The lexicographic compare on fixed-width lowercase hex is the same
    dialect-portable rule as ``hash_split`` — no engine-specific
    hex→int conversion anywhere, so the DuckDB oracle states the
    identical rule.  Intermediates stay under 2^63 for corpora up to
    ~9×10^12 rows (1000 × 1000 × N_total).  Like hash_split, membership
    is content-stable per row GIVEN the per-group thresholds; the
    thresholds themselves come from one tiny groupBy (|groups| rows)
    that joins back broadcast — the big table is touched map-side only.

    Groups missing from ``target_milli`` get target 0 (dropped).
    Returns (kept_df, thresholds_df) — thresholds carry
    (group, n_rows, keep_micro) for lineage/metrics.
    """
    # |groups| rows; persisted so n_total doesn't re-scan the big table
    # (unpersisted, counts.agg() would recompute the whole aggregation)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows")).persist()
    total = counts.agg(F.sum("n_rows").alias("n_total"))
    tgt = F.create_map(
        *[x for kv in target_milli.items() for x in (F.lit(kv[0]), F.lit(int(kv[1])))]
    )
    thr = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("target_milli", F.coalesce(tgt[F.col(group_col)], F.lit(0)))
        .withColumn(
            "keep_micro",
            F.least(
                F.lit(1_000_000).cast("long"),
                # BIGINT floor division (`div`), NOT `/` (which is DOUBLE
                # division in Spark and loses exactness above 2^53)
                F.expr(
                    "(CAST(1000 AS BIGINT) * target_milli * n_total) div n_rows"
                ),
            ).cast("long"),
        )
        .withColumn(
            "thr_hex",
            # keep_micro == 1e6 means keep-all; its threshold (16^6) is 7
            # hex digits and 'g' sorts after every hex char, so "g" is the
            # exact keep-all sentinel under the 6-char lexicographic rule
            F.when(F.col("keep_micro") >= 1_000_000, F.lit("g")).otherwise(
                F.lpad(
                    F.lower(
                        F.hex(
                            F.expr(
                                "(keep_micro * CAST(16777216 AS BIGINT)) div 1000000"
                            )
                        )
                    ),
                    6,
                    "0",
                )
            ),
        )
    )
    kept = (
        df.join(F.broadcast(thr.select(group_col, "thr_hex")), group_col)
        .filter(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 6
            )
            < F.col("thr_hex")
        )
        .drop("thr_hex")
    )
    return kept, thr.select(group_col, "n_rows", "keep_micro")


def sequence_packing(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    tokens_count: Column,
    budget: int,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing stats: documents are
    concatenated in deterministic ``id_col`` order within each group and
    sliced into fixed ``budget``-token training contexts; a document whose
    token span crosses a slice boundary straddles into the next pack(s).

    Returns one row per (group, pack_id) with the docs that START in the
    pack (``n_docs``), their total token mass (``n_tokens``), and how many
    of them straddle a boundary (``n_straddlers``) — the padding-free
    packing accounting a training-data pipeline reports before writing
    batches.

    Scale: the in-group running sum is inherently sequential, so this
    exact shape shards to ONE task per group.  At 100 TB you pack per
    (group, shard) instead — pack boundaries need not be globally
    contiguous across shards, only within a shard — which turns the
    window into embarrassingly parallel per-shard windows; the group_cols
    list is the hook (pass e.g. ["lang", "shard"]).  Everything is
    JVM-side: one scan, one hash-partition by group for the window, one
    partial-agg groupBy on the same key (no second exchange: the window
    already clustered the data).
    """
    w = Window.partitionBy(*group_cols).orderBy(id_col)
    spans = df.select(
        *group_cols,
        F.col(id_col),
        tokens_count.cast("long").alias("n_tok"),
    ).withColumn("cum_end", F.sum("n_tok").over(w))
    spans = spans.withColumn("cum_start", F.col("cum_end") - F.col("n_tok"))
    # `div` = exact int64 division (a double round-trip would lose
    # exactness once cumulative token counts pass 2^53 at corpus scale)
    b = int(budget)
    spans = spans.withColumn(
        "pack_id", F.expr(f"cum_start div {b}")
    ).withColumn(
        # pack of the doc's LAST token; > pack_id means it straddles
        "pack_last",
        F.expr(f"(cum_end - 1) div {b}"),
    )
    return spans.groupBy(*group_cols, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum(
            F.when(F.col("pack_last") > F.col("pack_id"), 1).otherwise(0)
        ).alias("n_straddlers"),
    )
