"""Content-defined chunking: vectorized-vs-sequential Gear equivalence,
boundary resync after insertions, min/max size contracts, and the Spark
shared-chunk pair join (incl. the hot-chunk cap)."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_cdc import (
    _GEAR,
    cdc_boundaries,
    cdc_shared_chunk_pairs,
)


def _ref_cuts(buf, mask_bits=9, min_size=128, max_size=2048):
    """Byte-at-a-time Gear reference: h = (h << 1) + G[b], reset per cut."""
    mask = ((1 << mask_bits) - 1) << (64 - mask_bits)
    n = len(buf)
    cuts, start = [], 0
    while start < n:
        if n - start <= min_size:
            cuts.append(n)
            break
        h, cut = 0, None
        end_max = min(start + max_size, n)
        for j in range(start, end_max):
            h = ((h << 1) + int(_GEAR[buf[j]])) & 0xFFFFFFFFFFFFFFFF
            if j - start + 1 >= min_size and (h & mask) == 0:
                cut = j + 1
                break
        if cut is None:
            cut = end_max
        cuts.append(cut)
        start = cut
    return cuts


def test_vectorized_matches_sequential():
    rng = np.random.RandomState(17)
    for n in (0, 1, 127, 128, 129, 3000, 9000):
        buf = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
        for mb in (8, 9):
            assert cdc_boundaries(buf, mask_bits=mb) == _ref_cuts(
                buf, mask_bits=mb
            ), (n, mb)


def test_size_contracts():
    rng = np.random.RandomState(23)
    buf = rng.randint(0, 256, 20000, dtype=np.uint8).tobytes()
    cuts = cdc_boundaries(buf, mask_bits=7, min_size=128, max_size=2048)
    assert cuts[-1] == len(buf)
    prev = 0
    for c in cuts[:-1]:  # all but the forced tail
        assert 128 <= c - prev <= 2048
        prev = c


def test_boundary_resync_after_insertion():
    rng = np.random.RandomState(31)
    shared = rng.randint(0, 256, 8000, dtype=np.uint8).tobytes()
    a = rng.randint(0, 256, 501, dtype=np.uint8).tobytes() + shared
    b = rng.randint(0, 256, 1702, dtype=np.uint8).tobytes() + shared

    def chunkset(buf):
        out, prev = set(), 0
        for c in cdc_boundaries(buf, mask_bits=8):
            out.add(hashlib.blake2b(buf[prev:c], digest_size=8).digest())
            prev = c
        return out

    common = chunkset(a) & chunkset(b)
    assert len(common) >= 10  # ~31 chunks in 8000B at 256B average


def test_shared_chunk_pairs_spark(spark):
    rng = np.random.RandomState(41)
    seg = {g: rng.randint(0, 256, 6000, dtype=np.uint8) for g in range(2)}
    rows = []
    for i in range(6):
        junk1 = np.random.RandomState(100 + i).randint(
            0, 256, 600 + 137 * i, dtype=np.int32
        ).astype(np.uint8)
        junk2 = np.random.RandomState(200 + i).randint(
            0, 256, 400 + 53 * i, dtype=np.int32
        ).astype(np.uint8)
        payload = np.concatenate([junk1, seg[i % 2], junk2]).tobytes()
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "id int, bytes binary")
    got = {
        (r["id1"], r["id2"])
        for r in cdc_shared_chunk_pairs(
            df, "id", "bytes", min_shared=3, mask_bits=8
        ).collect()
    }
    want = {(0, 2), (0, 4), (2, 4), (1, 3), (1, 5), (3, 5)}
    assert got == want


def test_hot_chunk_cap_drops_boilerplate(spark):
    # every clip shares one "silence" block; cap=2 must drop it so no
    # pairs survive (no other shared content)
    silence = np.zeros(4000, dtype=np.uint8)
    rows = []
    for i in range(5):
        junk = np.random.RandomState(300 + i).randint(
            0, 256, 3000 + 211 * i, dtype=np.int32
        ).astype(np.uint8)
        rows.append((i, bytearray(np.concatenate([junk, silence]).tobytes())))
    df = spark.createDataFrame(rows, "id int, bytes binary")
    got = cdc_shared_chunk_pairs(
        df, "id", "bytes", min_shared=1, mask_bits=8, hot_chunk_cap=2
    ).collect()
    assert got == []


def test_cdc_savings_exact(spark):
    from text_similarity_node_spark.operators.audio_cdc import cdc_savings

    rng = np.random.RandomState(47)
    seg = rng.randint(0, 256, 6000, dtype=np.uint8)
    rows = []
    for i in range(4):
        junk = np.random.RandomState(400 + i).randint(
            0, 256, 900 + 311 * i, dtype=np.int32
        ).astype(np.uint8)
        rows.append((i, bytearray(np.concatenate([junk, seg]).tobytes())))
    df = spark.createDataFrame(rows, "id int, bytes binary")
    got = cdc_savings(df, "id", "bytes").collect()[0]
    # recompute expected from the chunker itself (python side)
    total, uniq = 0, {}
    for i, buf in rows:
        buf = bytes(buf)
        prev = 0
        for c in cdc_boundaries(buf, mask_bits=8):
            total += c - prev
            uniq[
                (hashlib.blake2b(buf[prev:c], digest_size=8).digest(), c - prev)
            ] = c - prev
            prev = c
    u = sum(uniq.values())
    assert got["n_clips"] == 4
    assert got["total_bytes"] == total
    assert got["unique_chunk_bytes"] == u
    assert got["savings_ratio_micro"] == int(1_000_000 * (total - u) / total)
    # the shared segment must actually produce savings
    assert got["savings_ratio_micro"] > 300_000


def test_cdc_edges_compose_with_cc(spark):
    """CDC pairs are edge-shaped (id1, id2) — they drop into the same
    connected-components stage as text/landmark edges, giving byte-splice
    dedup clusters with no extra machinery."""
    from text_similarity_node_spark.operators.components import (
        connected_components,
    )

    rng = np.random.RandomState(53)
    seg = {g: rng.randint(0, 256, 6000, dtype=np.uint8) for g in range(3)}
    rows = []
    for i in range(9):
        junk = np.random.RandomState(500 + i).randint(
            0, 256, 700 + 173 * i, dtype=np.int32
        ).astype(np.uint8)
        rows.append((i, bytearray(np.concatenate([junk, seg[i % 3]]).tobytes())))
    df = spark.createDataFrame(rows, "id int, bytes binary")
    edges = cdc_shared_chunk_pairs(
        df, "id", "bytes", min_shared=3, mask_bits=8
    ).select("id1", "id2")
    comp = connected_components(edges)
    got = {r["clip_id"]: r["cluster_id"] for r in comp.collect()}
    for i in range(9):
        assert got[i] == i % 3  # cluster rep = min id of the class
