"""Image/video multimodal plumbing: raw codec round-trip, bilinear
resize, pHash separation, video frame sampling, and the pHash Hamming
near-dup join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.image import (
    decode_image,
    decode_raw_rgb8,
    encode_raw_rgb8,
    frame_phashes_udf,
    image_neardup,
    phash64,
    resize_bilinear,
    synth_image_udf,
    synth_video_udf,
    video_neardup,
)


def _class_img(g, seed_extra=None, noise=0.0):
    base = np.random.RandomState(1000 + g).rand(8, 8)
    x = np.kron(base, np.ones((8, 8))) * 255.0
    if noise:
        x = x + np.random.RandomState(seed_extra).randn(64, 64) * noise
    return np.clip(x, 0, 255).astype(np.uint8)[..., None].repeat(3, axis=2)


def test_raw_codec_roundtrip_and_stub():
    img = _class_img(3)
    assert np.array_equal(decode_raw_rgb8(encode_raw_rgb8(img)), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_resize_bilinear_identity_and_shape():
    x = np.arange(64, dtype=np.float64).reshape(8, 8)
    assert np.array_equal(resize_bilinear(x, 8, 8), x)
    y = resize_bilinear(x, 32, 16)
    assert y.shape == (32, 16)
    # corners are interpolation fixed points
    assert y[0, 0] == x[0, 0] and y[-1, -1] == x[-1, -1]


def test_phash_separation():
    """Same-pattern noisy captures stay within Hamming 4; distinct
    patterns stay beyond 6 — the radius-6 join is exact on this family."""
    def ham(a, b):
        return bin(a ^ b).count("1")

    ph = [phash64(_class_img(g)) for g in range(20)]
    for g in range(20):
        for s in range(3):
            noisy = phash64(_class_img(g, seed_extra=31 * g + s, noise=4.0))
            assert ham(ph[g], noisy) <= 4
    inter = min(
        ham(ph[i], ph[j]) for i in range(20) for j in range(i + 1, 20)
    )
    assert inter > 6


def test_video_frame_sampling(spark):
    """A 5-frame raw stream sampled every 2nd frame yields 3 hashes, and
    frames equal to a known image hash to the same value."""
    img = _class_img(7)
    stream = b"".join(encode_raw_rgb8(img) for _ in range(5))
    df = spark.createDataFrame([(1, stream)], "vid int, payload binary")
    rows = df.select(
        frame_phashes_udf(every_k=2)(F.col("payload")).alias("h")
    ).collect()
    hashes = rows[0].h
    assert len(hashes) == 3
    assert all(h == phash64(img) for h in hashes)


def test_image_neardup_recovers_classes(spark):
    """40 base images + noisy re-captures: the pHash Hamming join must
    recover exactly the same-class pairs."""
    ids = list(range(80)) + [1_000_000 + i for i in range(0, 80, 6)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").withColumn(
        "bytes", synth_image_udf()(F.col("doc_id"))
    ).withColumn("codec", F.lit("raw_rgb8"))
    found = {
        (r.id1, r.id2)
        for r in image_neardup(df, "doc_id", "bytes", hamming_radius=6).collect()
    }
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if a % 40 == b % 40
    }
    want = {(min(a, b), max(a, b)) for a, b in want}
    assert found == want


def test_video_neardup_recovers_classes(spark):
    """40-class 6-frame streams + per-frame-noised re-encodes: the
    frame-pHash join with temporal corroboration (>= 2 of 3 sampled
    positions) must recover exactly the same-class pairs, each matched on
    all 3 sampled positions."""
    ids = list(range(80)) + [1_000_000 + i for i in range(0, 80, 6)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").withColumn(
        "bytes", synth_video_udf()(F.col("doc_id"))
    )
    rows = video_neardup(
        df, "doc_id", "bytes", every_k=2, hamming_radius=6, min_frames=2
    ).collect()
    found = {(r.id1, r.id2) for r in rows}
    want = {
        (min(a, b), max(a, b))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if a % 40 == b % 40
    }
    assert found == want
    assert all(r.n_frames_matched == 3 for r in rows)


def test_video_neardup_single_frame_collision_rejected(spark):
    """min_frames=2 drops a pair that agrees on only one sampled position:
    clip B copies clip A's frames at position 0 only (sampled positions
    0, 2, 4 — positions 2 and 4 come from a different class)."""
    import pandas as pd

    from text_similarity_node_spark.operators.image import encode_raw_rgb8

    def frames_for(cls, n=6):
        out = []
        for f in range(n):
            base = np.random.RandomState(1000 + cls * 101 + f).rand(8, 8)
            x = np.kron(base, np.ones((8, 8))) * 255.0
            out.append(
                np.clip(x, 0, 255).astype(np.uint8)[..., None].repeat(3, axis=2)
            )
        return out

    a = frames_for(1)
    b = frames_for(2)
    b[0] = a[0]  # one shared sampled position
    payloads = [
        (1, b"".join(encode_raw_rgb8(f) for f in a)),
        (2, b"".join(encode_raw_rgb8(f) for f in b)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(payloads, columns=["doc_id", "bytes"])
    )
    got = video_neardup(
        df, "doc_id", "bytes", every_k=2, hamming_radius=6, min_frames=2
    ).collect()
    assert got == []
