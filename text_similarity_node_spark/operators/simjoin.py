"""Exact set-similarity join via prefix filtering (no false negatives).

The deterministic complement to MinHash-LSH (which is probabilistic): for a
Jaccard threshold t, order each record's distinct tokens by global frequency
(rarest first — the canonical ordering from the prefix-filter literature:
Chaudhuri et al. SSJoin, Bayardo et al. All-Pairs, Xiao et al. PPJoin); a
pair with jaccard >= t MUST share at least one token in each record's first
``|tokens| - ceil(t * |tokens|) + 1`` tokens.  Joining on prefix tokens is
therefore candidate-complete; the exact kernel then verifies.

This is the engine's exact-recall scale path: the prefix join touches only
rare tokens (frequency ordering makes prefixes selective), and the length
filter |y| >= t*|x| prunes before the verify.

Implementation is pure DataFrame ops: token explode -> global frequency ->
per-record rank -> prefix explode -> equi-join on token -> verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C


def prefix_filter_jaccard_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """df(id, tokens array<string>) -> pairs(id1, id2, jaccard) with
    set-Jaccard >= threshold.  Exact (recall 1.0 by construction).

    ``group_cols`` (optional) restricts pairs to records sharing those
    columns (a partitioned similarity join, e.g. same-language only): the
    group keys join into both the frequency table and the candidate
    equi-join, so cross-group candidates are never generated and token
    frequencies — hence prefix selectivity — are per-group."""
    groups = list(group_cols or [])
    toks = df.select(
        F.col(id_col).alias("rid"),
        *groups,
        F.array_distinct(F.col(tokens_col)).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    # Materialize once: the plan below references `toks` four times (flat /
    # both verify sides) and the prefix subtree twice (candidate self-join);
    # without a cut Spark recomputes the tokenize+rank pipeline per branch
    # (measured 34 s -> ~13 s at sf0.1).  persist, not localCheckpoint:
    # checkpointing writes partitions to executor disk and the write
    # serializes on shared-disk hardware; the ContextCleaner unpersists
    # the blocks when the plan is GC'd, so there is no storage leak.
    toks = toks.persist()

    flat = toks.select("rid", "sz", *groups, F.explode("toks").alias("tok"))
    freq = flat.groupBy("tok", *groups).agg(F.count(F.lit(1)).alias("df"))
    # canonical order: rarest token first, tie-broken by token value
    # (per-group frequencies — pairs never cross groups, so the ordering
    # only needs to be consistent within a group)
    ranked = (
        flat.join(freq, ["tok", *groups])
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("rid").orderBy(F.col("df").asc(), F.col("tok").asc())
            ),
        )
    )
    # prefix length = sz - ceil(t*sz) + 1
    prefix = ranked.filter(
        F.col("rank") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("rid", "sz", *groups, "tok")
    # second cut: the self-join would otherwise evaluate freq+window twice
    prefix = prefix.persist()

    a, b = prefix.alias("a"), prefix.alias("b")
    join_cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.rid") < F.col("b.rid"))
        # length filter: |y| in [t*|x|, |x|/t] is necessary for jac >= t
        & (F.col("b.sz") >= F.ceil(F.lit(threshold) * F.col("a.sz")))
        & (F.col("a.sz") >= F.ceil(F.lit(threshold) * F.col("b.sz")))
    )
    for g in groups:
        join_cond = join_cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    cand = (
        a.join(b, join_cond)
        .select(F.col("a.rid").alias("id1"), F.col("b.rid").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )

    t1 = toks.select(F.col("rid").alias("id1"), F.col("toks").alias("toks1"))
    t2 = toks.select(F.col("rid").alias("id2"), F.col("toks").alias("toks2"))
    verified = (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .withColumn("jaccard", C.set_jaccard(F.col("toks1"), F.col("toks2")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return verified


def prefix_filter_editdist_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
    q: int = 3,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """df(id, text) -> pairs(id1, id2, dist) with edit distance <= max_dist.
    Exact (recall 1.0 by construction) — the Ed-Join family (Xiao, Wang,
    Lin 2008) re-expressed relationally, the absolute-edit-distance sibling
    of :func:`prefix_filter_jaccard_join`.

    Candidate generation rests on the multiset q-gram count filter
    (Sarawagi-Kirpal / Gravano et al.): one edit operation rewrites at most
    ``q`` q-gram occurrences, so ed(a,b) <= d implies the *multiset*
    q-gram intersection is >= max(n_a, n_b) - q*d (n = len - q + 1
    occurrences).  Multiset semantics are realized by occurrence-numbered
    tokens (``gram#k``, k-th occurrence of that gram within the record —
    canonical per-gram counters, not positions, so the min-count identity
    holds verbatim).  With a common rarest-first global order, the prefix
    lemma then guarantees two qualifying records share a token within their
    first ``q*d + 1`` occurrence-tokens whenever max(n_a, n_b) >= q*d + 1;
    the equi-join on prefix tokens is therefore candidate-complete for all
    pairs except short x short.

    Records with n <= q*d occurrences (len < q*d + q: these can, in the
    worst case, share zero q-grams with a qualifying partner) are routed
    through a brute-force side pool joined to every record within the
    length filter — the pool is O(docs shorter than q*(d+1)) and empties
    entirely on natural corpora; at 100 TB it stays a broadcast.

    The verify is the JVM banded Levenshtein built-in (O(d*n), early
    abandon past the band); unlike the reference's similarity-normalized
    kernel (levenshtein.cpp:314-321) this emits the raw distance — the
    fuzzy-match-join contract (transcript variants, OCR noise).
    """
    groups = list(group_cols or [])
    d = int(max_dist)
    if d < 0:
        raise ValueError("max_dist must be >= 0")
    prefix_len = q * d + 1

    base = df.select(
        F.col(id_col).alias("rid"), *groups, F.col(text_col).alias("txt")
    ).withColumn("len", F.length("txt"))
    # consumed by gram generation, the short pool, and both verify sides
    base = base.persist()

    # occurrence-numbered q-grams (multiset tokens).  posexplode keeps the
    # text column out of the shuffled rows; the per-(rid, gram) counter is
    # a narrow window over the exploded grams.
    grams = (
        base.filter(F.col("len") >= q)
        .select(
            "rid",
            "len",
            *groups,
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(txt) - {q - 1}),"
                    f" i -> substring(txt, i, {q}))"
                )
            ).alias("gram"),
        )
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("rid", "gram").orderBy(F.monotonically_increasing_id())
            ),
        )
        .withColumn("tok", F.concat_ws("#", "gram", "occ"))
    )
    # rarest-first common order (per group — pairs never cross groups)
    freq = grams.groupBy("tok", *groups).agg(F.count(F.lit(1)).alias("df"))
    prefix = (
        grams.join(freq, ["tok", *groups])
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("rid").orderBy(F.col("df").asc(), F.col("tok").asc())
            ),
        )
        .filter(F.col("rank") <= prefix_len)
        .select("rid", "len", *groups, "tok")
    )
    prefix = prefix.persist()

    a, b = prefix.alias("a"), prefix.alias("b")
    join_cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.rid") < F.col("b.rid"))
        # ed <= d forces |len(a) - len(b)| <= d
        & (F.abs(F.col("a.len") - F.col("b.len")) <= d)
    )
    for g in groups:
        join_cond = join_cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    cand = a.join(b, join_cond).select(
        F.col("a.rid").alias("id1"), F.col("b.rid").alias("id2")
    )

    # short pool: records whose occurrence count can be wiped out entirely
    # by d edits.  Broadcast (bounded by construction) against everything
    # in length range; unordered pairs normalized to id1 < id2.
    short = base.filter(F.col("len") - (q - 1) <= q * d).select(
        F.col("rid").alias("srid"), *[F.col(g).alias(f"s_{g}") for g in groups],
        F.col("len").alias("slen"),
    )
    pool_cond = (F.abs(F.col("slen") - F.col("len")) <= d) & (
        F.col("srid") != F.col("rid")
    )
    for g in groups:
        pool_cond = pool_cond & (F.col(f"s_{g}") == F.col(g))
    pool = (
        F.broadcast(short)
        .join(base.select("rid", "len", *groups), pool_cond)
        .select(
            F.least("srid", "rid").alias("id1"),
            F.greatest("srid", "rid").alias("id2"),
        )
    )

    cand = cand.unionByName(pool).dropDuplicates(["id1", "id2"])

    t1 = base.select(F.col("rid").alias("id1"), F.col("txt").alias("txt1"))
    t2 = base.select(F.col("rid").alias("id2"), F.col("txt").alias("txt2"))
    thresholded = F.levenshtein(F.col("txt1"), F.col("txt2"), d)
    verified = (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .withColumn("dist", thresholded)
        .filter(F.col("dist") >= 0)  # built-in emits -1 past the band
        .select("id1", "id2", "dist")
    )
    return verified


def containment_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float,
    min_size: int = 1,
) -> DataFrame:
    """Exact ASYMMETRIC set-containment join: directed pairs
    (contained_id, container_id, isz, containment_micro) with
    |A ∩ B| >= threshold * |A| — "document A's vocabulary lives inside
    document B's".  The set-level complement of the winnowing pass
    (operators/suffix.py finds SUBSTRING containment; this finds
    subset containment regardless of word order), and of the symmetric
    Jaccard join above (a short quote inside a long page has tiny
    Jaccard but containment ~1).

    Prefix-filter theory (Chaudhuri et al. SSJoin, containment variant):
    if |A ∩ B| >= t|A| then A misses at most |A| - ceil(t|A|) tokens of
    its own set, so its rarest-first prefix of length
    |A| - ceil(t|A|) + 1 must intersect B — joining A-prefixes against
    B's FULL token index is candidate-complete; the exact
    array_intersect verify makes precision exact.  Containment is
    integer-exact end-to-end: the filter compares
    isz * 1_000_000 >= round(t * 1e6) * |A| and the reported
    containment_micro is a BIGINT floor-div (the q06 channel).

    Scale notes: the asymmetric index is the honest cost — B explodes
    every distinct token, so posting lists of corpus stopwords are the
    hot keys; at 10^12 rows put a df cap WITH metrics in front (the q04
    -> q37 migration) or df-order B's postings and cut at the largest
    rank any prefix can reach.  The A side only explodes prefixes
    (rare tokens by construction).  min_size gates degenerate contained
    sides (|A| = 1 is contained in every doc sharing the word)."""
    t_micro = int(round(threshold * 1_000_000))
    toks = df.select(
        F.col(id_col).alias("rid"),
        F.array_distinct(F.col(tokens_col)).alias("toks"),
    ).withColumn("sz", F.size("toks")).filter(F.col("sz") >= 1)
    toks = toks.persist()  # flat/index/both verify sides (GC-cleaned)

    flat = toks.select("rid", "sz", F.explode("toks").alias("tok"))
    freq = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = flat.join(freq, "tok").withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("rid").orderBy(F.col("df").asc(), F.col("tok").asc())
        ),
    )
    prefix = ranked.filter(
        (F.col("sz") >= min_size)
        & (
            F.col("rank")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
    ).select(
        F.col("rid").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.col("tok").alias("tok_a"),
    )

    # distinct column names on each side: both lineages descend from the
    # same cached `toks`, and joining prefix["tok"] == index["tok"] makes
    # Spark collapse the predicate to trivially-true (same attribute id)
    index = flat.select(
        F.col("rid").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("tok").alias("tok_b"),
    )
    cand = (
        prefix.join(
            index,
            (F.col("tok_a") == F.col("tok_b"))
            & (F.col("id_a") != F.col("id_b"))
            # container must hold at least ceil(t*|A|) tokens
            & (F.col("sz_b") >= F.ceil(F.lit(threshold) * F.col("sz_a"))),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    t1 = toks.select(
        F.col("rid").alias("id_a"), F.col("toks").alias("toks_a"),
        F.col("sz").alias("sz_a"),
    )
    t2 = toks.select(F.col("rid").alias("id_b"), F.col("toks").alias("toks_b"))
    return (
        cand.join(t1, "id_a")
        .join(t2, "id_b")
        .withColumn(
            "isz", F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
        )
        .filter(
            F.col("isz") * F.lit(1_000_000) >= F.lit(t_micro) * F.col("sz_a")
        )
        .select(
            F.col("id_a").alias("contained_id"),
            F.col("id_b").alias("container_id"),
            "isz",
            F.expr("(isz * 1000000L) div sz_a").alias("containment_micro"),
        )
    )
