"""Distributed suffix array via prefix doubling (Manber-Myers on Spark).

The north rule names a "suffix-array substring pass" next to MinHash and
SimHash.  The classic O(n log n) suffix-array constructions (Manber-Myers
doubling, DC3) are written for one address space; `operators/span_dedup.py`
and `operators/suffix.py` cover the fixed-length and sampled regimes with
relational re-expressions.  This module is the literal pass: a suffix
array *constructed distributively*, usable when the corpus itself (not a
fingerprint sample of it) must be in suffix order — exact repeated-
substring detection at arbitrary length thresholds without winnowing's
window parameter or span-dedup's fixed token width.

Construction = Manber-Myers prefix doubling re-expressed in DataFrame ops:

  rank_1[p]   = dense rank of the single codepoint at p
  rank_2d[p]  = dense rank of (rank_d[p], rank_d[p + d])   -- d doublings

with two Spark-specific choices:

* ``rank_d[p + d]`` is ``lead(rank, d)`` over a per-document window —
  suffixes never cross document boundaries (each document is its own
  string; the corpus-level array is the union), so the doubling "fetch
  rank at p+d" is a window function after ONE hash exchange on doc_id,
  not a positional self-join.  Past-end reads default to rank 0, below
  every real rank: a proper prefix sorts before its extensions, the
  standard $-terminator semantics.
* the dense rank itself never uses a global one-partition window (the
  classic Spark scale trap).  ``_dense_rank`` below range-repartitions on
  the key, sorts within partitions, ships a per-partition summary
  (row/distinct counts + boundary keys) to the driver — O(partitions)
  rows — and assigns contiguous ranks in a second partition-local pass
  with broadcast offsets.  Two shuffle-free scans + one range exchange
  per doubling; O(log depth) doublings total.

At 100 TB: rows are (doc_id, pos, rank) int64 triples — the TEXT never
shuffles after the first explode.  Range repartition distributes the sort
the way a cluster sorts terabytes (this is exactly Spark's
sort-merge-join machinery); per-document windows need one document per
partition group, bounded by max transcript length, not corpus size.
Each doubling is a full-corpus exchange, so the pass costs ~log2(L)
sorted shuffles of 24-byte rows — the honest price of exact suffix
order; the winnowing/span passes remain the cheap screens in front of
it (SURVEY.md §7.5 tiering).

Reference ground: the reference's sequence kernels (LCS family,
/root/reference/src/algorithms/) define pairwise substring semantics;
corpus-wide suffix order is distributed machinery with no single-node
analogue in the reference, same status as winnowing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("first_k1", T.LongType()),
        T.StructField("first_k2", T.LongType()),
        T.StructField("last_k1", T.LongType()),
        T.StructField("last_k2", T.LongType()),
    ]
)


def _dense_rank(rows: DataFrame, out: str = "rank") -> tuple[DataFrame, int]:
    """Contiguous 1-based dense rank over the int64 key (k1, k2).

    Returns (rows + ``out`` column, total distinct keys).  Scalable shape:
    range exchange on the key, then two partition-local passes — a tiny
    per-partition summary collected to the driver (one row per partition)
    and a broadcast-offset rank assignment.  No global-order window.

    Rows must carry k1/k2 (int64); all other columns pass through.  The
    returned frame is PERSISTED AND MATERIALIZED (the per-partition
    summary already forces one pass; materializing the ranked output lets
    the range-exchange cache be dropped before returning, so iterative
    callers hold at most one cached frame per live rank generation).
    """
    rp = (
        rows.repartitionByRange(F.col("k1"), F.col("k2"))
        .sortWithinPartitions("k1", "k2")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )

    def _summarize(batches):
        import pandas as pd

        pid = None
        n_rows = 0
        n_distinct = 0
        first = last = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
                first = (int(pdf["k1"].iloc[0]), int(pdf["k2"].iloc[0]))
            k1 = pdf["k1"].to_numpy()
            k2 = pdf["k2"].to_numpy()
            # rows where the key differs from the previous row (first row
            # of the batch compares against the running ``last``)
            changed = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
            n_new = int(changed.sum())
            head = (int(k1[0]), int(k2[0]))
            if last is None or head != last:
                n_new += 1
            n_distinct += n_new
            n_rows += len(pdf)
            last = (int(k1[-1]), int(k2[-1]))
        if pid is None:
            return
        yield pd.DataFrame(
            {
                "pid": [pid],
                "n_rows": [n_rows],
                "n_distinct": [n_distinct],
                "first_k1": [first[0]],
                "first_k2": [first[1]],
                "last_k1": [last[0]],
                "last_k2": [last[1]],
            }
        )

    summary = sorted(
        rp.mapInPandas(_summarize, _SUMMARY_SCHEMA).collect(),
        key=lambda r: r["pid"],
    )
    offsets: dict[int, int] = {}
    total = 0
    prev_last = None
    for r in summary:
        off = total
        first = (r["first_k1"], r["first_k2"])
        if prev_last is not None and first == prev_last:
            # key straddles a partition boundary (range partitioner puts
            # equal keys together, so this is defensive): merge its rank
            off -= 1
        offsets[r["pid"]] = off
        total = off + r["n_distinct"]
        prev_last = (r["last_k1"], r["last_k2"])

    out_schema = T.StructType(
        [f for f in rp.schema.fields if f.name != "_pid"]
        + [T.StructField(out, T.LongType())]
    )
    cols = [f.name for f in out_schema.fields if f.name != out]

    def _assign(batches):
        import numpy as np

        rank = None  # running dense rank across batches of this partition
        last = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if rank is None:
                rank = offsets[int(pdf["_pid"].iloc[0])]
            k1 = pdf["k1"].to_numpy()
            k2 = pdf["k2"].to_numpy()
            new = np.empty(len(pdf), dtype=bool)
            new[0] = last is None or (int(k1[0]), int(k2[0])) != last
            new[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
            res = pdf[[c for c in cols]].copy()
            res[out] = rank + np.cumsum(new)
            rank = int(res[out].iloc[-1])
            last = (int(k1[-1]), int(k2[-1]))
            yield res

    ranked = rp.mapInPandas(_assign, out_schema).persist()
    ranked.count()  # materialize, then the exchange cache can go
    rp.unpersist()
    return ranked, total


def corpus_positions(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, text) -> (id, pos, n, code): one row per codepoint position.

    ``pos`` is 0-based, ``n`` the document's codepoint length, ``code``
    the codepoint value (BMP; supplementary-plane codepoints split into
    surrogates by the JVM split — transcripts here are BMP).
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.length(text_col).alias("n"),
            F.posexplode(F.split(F.col(text_col), "")).alias("pos", "_ch"),
        )
        .filter(F.col("_ch") != "")
        .select(
            "doc_id",
            "pos",
            "n",
            # codepoint via UTF-32 bytes (Java's UTF-32 encodes big-endian,
            # no BOM: 4 bytes per codepoint), hex -> int
            F.expr(
                "cast(conv(hex(encode(_ch, 'UTF-32')), 16, 10) as bigint)"
            ).alias("code"),
        )
    )


def suffix_ranks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    depth: int,
) -> tuple[DataFrame, dict]:
    """Suffix ranks at the smallest power-of-two depth >= ``depth``.

    Returns (ranks, info): ranks = (doc_id, pos, n, rank) where rank is
    the contiguous dense rank of suffix (doc_id, pos) among ALL corpus
    suffixes, ordered by their first ``info['depth']`` codepoints (a
    suffix shorter than the depth compares as if terminated by a
    sentinel below every codepoint).  Equal rank <=> equal prefix at
    that depth.  ``info['all_distinct']`` reports early convergence: no
    two suffixes share ``info['depth']`` codepoints beyond it.
    """
    pos = corpus_positions(docs, id_col, text_col)
    rows = pos.select(
        "doc_id", "pos", "n",
        F.col("code").alias("k1"), F.lit(0).cast("long").alias("k2"),
    )
    ranked, n_distinct = _dense_rank(rows)
    n_rows = ranked.count()

    d = 1
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    while d < depth and n_distinct < n_rows:
        nxt = ranked.select(
            "doc_id", "pos", "n",
            F.col("rank").alias("k1"),
            F.lead("rank", d, 0).over(by_pos).alias("k2"),
        )
        new_ranked, n_distinct = _dense_rank(nxt)
        ranked.unpersist()
        ranked = new_ranked
        d *= 2
    ranked = ranked.drop("k1", "k2")
    return ranked, {"depth": d, "all_distinct": n_distinct == n_rows,
                    "n_suffixes": n_rows, "n_distinct": n_distinct}


def repeated_substring_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
    group_cap: int = 10_000,
) -> tuple[DataFrame, DataFrame, dict]:
    """Exact doc pairs sharing any >= ``min_len``-codepoint substring.

    The suffix-array substring pass at an arbitrary length threshold:
    doubling runs to depth d (smallest power of two >= ceil(L/2), so
    d <= L for L >= 2), then one exact refinement keys each full-length
    window by (rank_d[p], rank_d[p + L - d]) — the two depth-d reads
    overlap and together compare exactly L codepoints, the Manber-Myers
    fixed-length comparison trick.  Equal key <=> equal L-gram, so the
    pass has recall 1.0 and precision 1.0 by construction (no hash, no
    sampling; the DuckDB oracle can restate it as an L-gram self-join).

    Returns (pairs, group_metrics, info).  pairs = (doc_id_1, doc_id_2)
    distinct, doc_id_1 < doc_id_2.  Groups with more than ``group_cap``
    distinct docs are DROPPED WITH METRICS (group_metrics rows:
    key counts + disposition), the repo-wide no-silent-caps rule — a
    corpus-viral substring (boilerplate header shared by millions of
    docs) must not drive a quadratic pair join; at scale those groups
    are the span-dedup/removal tier's job, not the pairing tier's.
    """
    L = int(min_len)
    if L < 1:
        raise ValueError("min_len must be >= 1")
    need = max(1, math.ceil(L / 2))
    d_target = 1 << max(0, (need - 1).bit_length())

    ranked, info = suffix_ranks(docs, id_col, text_col, depth=d_target)
    d = info["depth"]
    if info["all_distinct"] and d <= L:
        # converged below the threshold: no two suffixes share even d
        # codepoints, hence none share L >= d
        spark = docs.sparkSession
        empty_pairs = spark.createDataFrame(
            [], "doc_id_1 long, doc_id_2 long")
        empty_metrics = spark.createDataFrame(
            [], "k1 long, k2 long, n_docs long, disposition string")
        return empty_pairs, empty_metrics, info

    off2 = L - d
    assert 0 <= off2 <= d, (L, d)
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    k2 = (
        F.lit(0).cast("long") if off2 == 0
        else F.lead("rank", off2, 0).over(by_pos)
    )
    # only full-length windows participate: pos + L <= n
    keyed = (
        ranked.select(
            "doc_id", "pos", "n", F.col("rank").alias("k1"), k2.alias("k2")
        )
        .filter(F.col("pos") + L <= F.col("n"))
        .select("doc_id", "k1", "k2")
        .distinct()  # one row per (doc, L-gram)
    )
    counts = keyed.groupBy("k1", "k2").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    metrics = counts.filter(F.col("n_docs") > 1).select(
        "k1", "k2", "n_docs",
        F.when(F.col("n_docs") > group_cap, F.lit("dropped"))
        .otherwise(F.lit("paired")).alias("disposition"),
    )
    live = keyed.join(
        counts.filter(
            (F.col("n_docs") > 1) & (F.col("n_docs") <= group_cap)
        ).select("k1", "k2"),
        ["k1", "k2"],
        "left_semi",
    )
    a, b = live.alias("a"), live.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.k2") == F.col("b.k2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )
    return pairs, metrics, info
