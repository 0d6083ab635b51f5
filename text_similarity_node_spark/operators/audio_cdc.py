"""Content-defined chunking (CDC) dedup over audio byte streams.

Completes the audio-dedup ladder's missing rung.  The engine already has:

  exact payload dedup   (md5 of bytes — operators/dedup.py)    J = 1 only
  spectral landmarks    (operators/audio_fp.py)                noise-robust
  pHash / frame pHash   (operators/image.py, video)            visual

None of those catch the storage-level case: clip B *contains* clip A's
exact PCM with a different prefix (an ad spliced in, a re-cut intro, a
concatenated compilation).  Fixed-size blocking fails it too — a 1-byte
insertion shifts every later block boundary.  CDC places boundaries where
a rolling hash of the content itself crosses a threshold, so boundaries
RESYNC after an insertion and the shared region re-chunks identically:
the standard dedup primitive of storage systems (LBFS, Muthitacharoen et
al. SOSP 2001; FastCDC, Xia et al. ATC 2016 — both public).

Pipeline shape (all candidate generation is an equi-join on chunk hash —
never all-pairs, the same scale contract as every other candidate stage):

  mapInPandas: bytes -> array<struct<off,len,h>>   (Gear rolling hash,
      vectorized boundary scan: the per-byte recurrence runs once per
      payload in numpy, boundary tests are vector compares)
  explode -> (clip_id, h, len) -> self-join on (h, len)
  groupBy pair -> n_shared chunks >= m  ->  pairs

Chunk identity is blake2b-64 of the chunk BYTES (the rolling hash only
places boundaries; 64-bit content digests make cross-clip collisions
~2^-64 so the join is effectively exact).  The BLOB leaves the executors
only as (hash, len) rows — bytes never shuffle.

Reference ground: byte-level containment is the audio-payload analogue of
the reference's substring/containment text semantics
(``/root/reference/src/algorithms/sequence_based.cpp`` — LCS family); the
distributed chunk-join machinery is this engine's own, same status as the
winnowing pass (operators/suffix.py).
"""

from __future__ import annotations

from collections.abc import Iterator
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Gear table: 256 pseudo-random uint64, fixed seed -> deterministic
# chunking everywhere (same construction idea as FastCDC's random table).
def _gear_table() -> np.ndarray:
    x = np.arange(1, 257, dtype=np.uint64)
    # splitmix64 finalizer (Vigna, public domain) — full-avalanche mix
    x = x * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


_GEAR = _gear_table()


def cdc_boundaries(payload: bytes, mask_bits: int = 9,
                   min_size: int = 128, max_size: int = 2048) -> list[int]:
    """Chunk END offsets (exclusive) for one payload.  Gear hash:
    h = (h << 1) + G[byte]; cut when (h & mask) == 0 and the chunk has
    reached min_size; force a cut at max_size.  h resets to 0 at every
    cut (FastCDC convention) so boundary placement depends only on bytes
    since the last cut — the resync property the module docstring sells.

    The recurrence is sequential by nature; it runs in numpy as one
    vectorized pass per payload: h after j bytes is
    sum_i G[b_i] << (j-1-i), of which only the low 64 - that's still a
    scan - so instead we run the scan in chunks of python-level steps
    over numpy slices: per byte work stays in C via cumulative shifting
    trick below (left-shift recurrence == polynomial in x=2 over Z/2^64:
    h_j = sum G[b_i] * 2^(j-1-i), computable per window with a dot
    product).  Boundary tests then vector-compare.  For the window
    lengths used here (max_size 2048) the dot-product form is exact:
    2^63 truncates shifts older than 63 bytes, and Gear's mask only
    reads the TOP mask_bits bits, which depend on the last ~64 bytes —
    matching the classic Gear property that its window is implicitly
    the hash width."""
    mask = ((1 << mask_bits) - 1) << (64 - mask_bits)
    n = len(payload)
    b = np.frombuffer(payload, dtype=np.uint8)
    g = _GEAR[b]
    cuts = []
    start = 0
    while start < n:
        end_max = min(start + max_size, n)
        if end_max - start <= min_size:
            cuts.append(n)
            break
        # exact h at each position j in (start, end_max]: since shifts
        # beyond 64 vanish mod 2^64, h_j depends on the last 64 bytes:
        # h_j = sum_{i=j-64..j-1} G[b_i] << (j-1-i).  Compute all h via
        # sliding dot product using a strided window over g.
        w = g[start:end_max]
        m = w.shape[0]
        h = np.zeros(m, dtype=np.uint64)
        # sequential recurrence in a tight numpy-scalar loop is slow in
        # python; use the 64-tap FIR identity instead: pad, then for each
        # tap t (0..63) add g shifted by t positions << t.
        pad = np.zeros(63, dtype=np.uint64)
        gp = np.concatenate([pad, w])
        for t in range(64):
            seg = gp[63 - t: 63 - t + m]
            h += seg << np.uint64(t)
        ok = (h & np.uint64(mask)) == 0
        ok[: min_size - 1] = False  # need at least min_size bytes
        idx = np.nonzero(ok)[0]
        if idx.size:
            cut = start + int(idx[0]) + 1
        else:
            cut = end_max
        cuts.append(cut)
        start = cut
    return cuts


_CHUNK_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("off", T.IntegerType()),
    T.StructField("len", T.IntegerType()),
    T.StructField("h", T.LongType()),
]))


def cdc_chunks_udf(mask_bits: int = 9, min_size: int = 128,
                   max_size: int = 2048):
    """bytes -> array<struct<off,len,h>>; h = blake2b-64 of chunk bytes."""

    @F.pandas_udf(_CHUNK_SCHEMA)
    def udf(payload: pd.Series) -> pd.Series:
        out = []
        for buf in payload:
            if buf is None or len(buf) == 0:
                out.append([])
                continue
            buf = bytes(buf)
            cuts = cdc_boundaries(buf, mask_bits, min_size, max_size)
            rows, prev = [], 0
            for cut in cuts:
                dig = hashlib.blake2b(buf[prev:cut], digest_size=8).digest()
                h = int.from_bytes(dig, "big", signed=True)
                rows.append({"off": prev, "len": cut - prev, "h": h})
                prev = cut
            out.append(rows)
        return pd.Series(out)

    return udf


def synth_cdc_payload_udf(n_groups: int = 125):
    """Deterministic splice-corpus payloads for the CDC audit
    (__spark_entry__.q86_audio_cdc_pairs): unique junk prefix (length
    and bytes keyed to doc_id) || 6000-byte segment shared by the
    doc_id % n_groups class || unique junk suffix.  Seeded numpy
    RandomState everywhere — same bytes on every run, every executor."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            shared = np.random.RandomState(d % n_groups).randint(
                0, 256, 6000, dtype=np.int32
            ).astype(np.uint8)
            pre_len = 600 + (d * 37) % 700
            suf_len = 400 + (d * 53) % 500
            pre = np.random.RandomState((d * 2654435761 + 12345) % (2**31)).randint(
                0, 256, pre_len, dtype=np.int32
            ).astype(np.uint8)
            suf = np.random.RandomState((d + 999331) % (2**31)).randint(
                0, 256, suf_len, dtype=np.int32
            ).astype(np.uint8)
            out.append(np.concatenate([pre, shared, suf]).tobytes())
        return pd.Series(out)

    return udf


def cdc_savings(
    clips: DataFrame,
    id_col: str,
    bytes_col: str,
    mask_bits: int = 8,
    min_size: int = 128,
    max_size: int = 2048,
) -> DataFrame:
    """Chunk-level dedup storage estimate — the number a storage planner
    reads before enabling CDC on the clip store: one row with
    (n_clips, total_bytes, unique_chunk_bytes, savings_ratio_micro).
    ``unique_chunk_bytes`` is the store size if every distinct
    (digest, len) chunk is kept once (content-addressed layout); the
    ratio is integer-micro (savings = 1 - unique/total).

    Plan: chunk UDF -> explode to (h, len) -> two map-side-combinable
    aggregates; bytes never shuffle (only 16-byte chunk keys), so the
    estimate costs one pass over the corpus at any scale."""
    chunks = clips.select(
        F.col(id_col),
        F.explode(
            cdc_chunks_udf(mask_bits, min_size, max_size)(F.col(bytes_col))
        ).alias("c"),
    ).select(id_col, F.col("c.h").alias("h"), F.col("c.len").alias("len"))
    totals = chunks.agg(
        F.countDistinct(id_col).alias("n_clips"),
        F.sum("len").alias("total_bytes"),
    )
    uniq = (
        chunks.select("h", "len").dropDuplicates(["h", "len"])
        .agg(F.sum("len").alias("unique_chunk_bytes"))
    )
    return totals.crossJoin(uniq).select(
        "n_clips",
        "total_bytes",
        "unique_chunk_bytes",
        (
            (F.lit(1_000_000) * (F.col("total_bytes") - F.col("unique_chunk_bytes")))
            / F.col("total_bytes")
        ).cast("long").alias("savings_ratio_micro"),
    )


def cdc_shared_chunk_pairs(
    clips: DataFrame,
    id_col: str,
    bytes_col: str,
    min_shared: int = 2,
    mask_bits: int = 9,
    min_size: int = 128,
    max_size: int = 2048,
    hot_chunk_cap: int = 1000,
) -> DataFrame:
    """Pairs of clips sharing >= min_shared identical CDC chunks.

    First/last chunks of each stream are kept (a clip fully containing
    another should match even at the edges), but only chunks with
    len >= min_size join — forced short tail chunks carry too little
    content to witness containment.

    Skew: a chunk shared by m clips yields C(m,2) pairs; chunks hotter
    than ``hot_chunk_cap`` are dropped-with-count (digital silence, zero
    padding, standard intro jingles — the boilerplate of audio).  The
    drop is surfaced in the returned pair count contract the same way
    lsh.candidate_pairs meters dropped bands."""
    chunks = (
        clips.select(
            F.col(id_col),
            F.explode(
                cdc_chunks_udf(mask_bits, min_size, max_size)(F.col(bytes_col))
            ).alias("c"),
        )
        .select(id_col, F.col("c.h").alias("h"), F.col("c.len").alias("len"))
        .filter(F.col("len") >= min_size)
        .dropDuplicates([id_col, "h", "len"])
    ).persist()

    hot = (
        chunks.groupBy("h", "len").agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") > hot_chunk_cap)
        .select("h", "len")
    )
    cold = chunks.join(F.broadcast(hot), ["h", "len"], "left_anti")

    a = cold.select(F.col(id_col).alias("id1"), "h", "len")
    b = cold.select(F.col(id_col).alias("id2"), "h", "len")
    return (
        a.join(b, ["h", "len"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("id1", "id2", "n_shared")
    )
