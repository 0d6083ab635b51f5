"""Haitsma-Kalker band-energy-difference audio fingerprints.

Second acoustic-fingerprint family next to the spectral-landmark scheme
(operators/audio_fp.py).  The landmark ("constellation") fingerprint keys on
a few strong spectral PEAKS — ideal for sparse tonal content and snippet
retrieval, but blind to broadband spectral SHAPE.  The Haitsma-Kalker hash
(Haitsma & Kalker 2002, "A Highly Robust Audio Fingerprint System" — public
method) is its complement: every frame contributes one sub-fingerprint word
whose bits are the SIGNS of the time-and-band differences of band energies,

    bit(n, m) = 1  iff  (E(n,m) - E(n,m+1)) - (E(n-1,m) - E(n-1,m+1)) > 0

— a coarse sign-quantized second derivative of the spectrogram that is
stable under noise, gain change (signs are scale-invariant), and mild
re-encoding, while unrelated audio agrees on each bit with probability
~1/2 (expected bit-error rate ~0.5).

Dedup shape (the engine's standard candidates-then-verify split):

  1. fingerprint: PCM -> Hann frames -> rFFT energy -> band energies ->
     sign bits -> one packed BIGINT per frame boundary (Arrow-batched
     numpy UDF; the only Python stage).
  2. candidates: clips sharing >= 1 EXACT sub-fingerprint word (explode ->
     hot-word cap WITH metrics -> equi-join), the same join discipline as
     the landmark/winnowing passes.  A true near-dup disagrees on only a
     few bit positions overall, so whole clean words survive; two
     unrelated clips share a w-bit word by chance 2^-w per frame pair.
  3. verify: bit-error rate between the aligned fingerprint sequences,
     entirely JVM-side (zip_with + bit_count + aggregate — the BLOB is
     never touched again), keep pairs with BER <= max_ber.

Scale notes: a clip reduces to ~n_frames 8-byte words; the payload never
shuffles.  The candidate join is one shuffle on the word value with the
same cap/salt options as every other hash join in the repo.  The verify
runs on candidate pairs only and is pure whole-stage-codegen arithmetic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audio import decode_pcm_s16le


def _band_matrix(frame_len: int, sr_hz: float, n_bands: int,
                 fmin: float, fmax: float) -> np.ndarray:
    """(n_rfft_bins, n_bands) 0/1 aggregation matrix: energy in band m =
    row-sum of rfft power over the bins whose center frequency falls in
    [edge_m, edge_{m+1})."""
    n_bins = frame_len // 2 + 1
    freqs = np.arange(n_bins) * (sr_hz / frame_len)
    edges = np.linspace(fmin, fmax, n_bands + 1)
    m = np.zeros((n_bins, n_bands))
    band = np.searchsorted(edges, freqs, side="right") - 1
    ok = (band >= 0) & (band < n_bands)
    m[np.nonzero(ok)[0], band[ok]] = 1.0
    return m


def hk_subfingerprints(
    x: np.ndarray,
    sr_hz: float,
    frame_len: int = 512,
    hop: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
) -> np.ndarray:
    """float waveform -> int64 array of (n_bands-1)-bit sub-fingerprints,
    one per consecutive frame pair.  Fully vectorized (one rFFT batch and
    one matmul per clip)."""
    if n_bands < 2 or n_bands > 33:
        raise ValueError("n_bands must be in [2, 33] (bits must pack in int64)")
    if len(x) < 2 * frame_len:
        return np.empty(0, dtype=np.int64)
    starts = np.arange(0, len(x) - frame_len + 1, hop)
    frames = x[starts[:, None] + np.arange(frame_len)[None, :]]
    spec = np.abs(np.fft.rfft(frames * np.hanning(frame_len), axis=1)) ** 2
    energy = spec @ _band_matrix(frame_len, sr_hz, n_bands, fmin, fmax)
    band_diff = energy[:, :-1] - energy[:, 1:]
    bits = (band_diff[1:, :] - band_diff[:-1, :]) > 0
    weights = (1 << np.arange(n_bands - 1)).astype(np.int64)
    return bits.astype(np.int64) @ weights


def hk_fingerprint_udf(
    frame_len: int = 512,
    hop: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
):
    """(bytes pcm_s16le, sr_hz) -> array<bigint> sub-fingerprint sequence.
    Short/empty payloads yield an empty array (null-free error channel)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(payload: pd.Series, sr_hz: pd.Series) -> pd.Series:
        out = []
        for b, sr in zip(payload, sr_hz):
            if b is None or sr is None or len(b) < 4 * frame_len:
                out.append([])
                continue
            fp = hk_subfingerprints(
                decode_pcm_s16le(b), float(sr), frame_len, hop,
                n_bands, fmin, fmax,
            )
            out.append([int(v) for v in fp])
        return pd.Series(out)

    return udf


def hk_candidate_pairs(
    df: DataFrame,
    id_col: str,
    fp_col: str,
    word_cap: int = 64,
    return_metrics: bool = False,
):
    """Clips sharing >= 1 exact sub-fingerprint word -> (id1 < id2,
    n_shared).  ``word_cap`` drops words carried by more than cap clips
    (constant-spectrum boilerplate: silence, dial tones — f^2/2 junk
    pairs), never silently: with ``return_metrics`` the dropped words
    come back as (w, n_docs) rows — the repo-wide no-silent-caps policy."""
    words = df.select(
        F.col(id_col).alias("rid"),
        F.explode_outer(F.array_distinct(F.col(fp_col))).alias("w"),
    ).filter(F.col("w").isNotNull())
    words = words.persist()
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_docs"))
    hot = counts.filter(F.col("n_docs") > word_cap)
    kept = words.join(F.broadcast(hot.select("w")), "w", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.rid") < F.col("b.rid")))
        .groupBy(F.col("a.rid").alias("id1"), F.col("b.rid").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if return_metrics:
        return pairs, hot
    return pairs


def hk_ber_col(fp1, fp2, n_bands: int) -> F.Column:
    """Bit-error rate between two sub-fingerprint arrays over their common
    prefix — pure JVM (zip_with + bit_count + aggregate), codegen-friendly."""
    common = F.least(F.size(fp1), F.size(fp2))
    a = F.slice(fp1, F.lit(1), common)
    b = F.slice(fp2, F.lit(1), common)
    errs = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    total_bits = common * (n_bands - 1)
    return F.when(total_bits > 0, errs.cast("double") / total_bits).otherwise(
        F.lit(1.0)
    )


def hk_neardup(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    sr_col: str = "sr_hz",
    max_ber: float = 0.25,
    word_cap: int = 64,
    frame_len: int = 512,
    hop: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
) -> DataFrame:
    """Audio near-dup pairs by Haitsma-Kalker fingerprint: candidates from
    shared exact words, verified by BER <= max_ber.  Returns (id1, id2,
    n_shared, ber).  Unrelated audio sits at BER ~0.5; noisy copies of one
    recording land near 0 (the 2002 paper's operating point is 0.35 on
    256-frame blocks; the default here is stricter because dedup wants
    precision, and the verify is exact either way)."""
    udf = hk_fingerprint_udf(frame_len, hop, n_bands, fmin, fmax)
    fps = df.select(
        F.col(id_col).alias("rid"),
        udf(F.col(bytes_col), F.col(sr_col)).alias("hk_fp"),
    ).persist()
    cand = hk_candidate_pairs(fps, "rid", "hk_fp", word_cap=word_cap)
    f1 = fps.select(F.col("rid").alias("id1"), F.col("hk_fp").alias("fp1"))
    f2 = fps.select(F.col("rid").alias("id2"), F.col("hk_fp").alias("fp2"))
    return (
        cand.join(f1, "id1")
        .join(f2, "id2")
        .withColumn("ber", hk_ber_col(F.col("fp1"), F.col("fp2"), n_bands))
        .filter(F.col("ber") <= max_ber)
        .select("id1", "id2", "n_shared", F.round("ber", 6).alias("ber"))
    )


# ---------------------------------------------------------------------------
# deterministic corpus for the driver query (q119)
# ---------------------------------------------------------------------------


def synth_hk_pcm_udf(
    n_classes: int = 40,
    sr_hz: int = 16000,
    n_segs: int = 31,
    seg_len: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
    jitter_amp: float = 0.002,
):
    """Deterministic broadband pcm_s16le clip per id for the HK driver
    query: class = id % n_classes; the clip is a sum of band-center sines
    whose per-segment amplitudes are a seeded CONTINUOUS uniform draw
    keyed by the class — so band energies vary frame to frame and the HK
    sign bits are informative (a stationary tone has zero temporal
    energy-difference everywhere: every bit would ride on noise).
    Continuous amplitudes keep |energy difference| away from 0, so the
    sign bits are stable under the planted jitter.  Ids >= 1_000_000 add
    seeded Gaussian jitter (signal rms ~0.11, noise rms 0.002 -> ~35 dB
    SNR, the corpus family's >= 30 dB fidelity regime): the noisy-copy
    rows.
    1_000_000 % n_classes must be 0 so a copy shares its source's class
    and `id % n_classes` is the SQL-expressible ground-truth key (the
    q32/q34 congruence-oracle construction)."""
    if 1_000_000 % n_classes != 0:
        raise ValueError("n_classes must divide 1_000_000 (congruence oracle)")

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        cache: dict[int, np.ndarray] = {}
        n = n_segs * seg_len
        for d in doc_id:
            d = int(d)
            cls = d % n_classes
            if cls not in cache:
                cache[cls] = hk_class_signal(
                    cls, sr_hz, n_segs, seg_len, n_bands, fmin, fmax
                )
            x = cache[cls]
            if d >= 1_000_000:
                x = x + jitter_amp * np.random.RandomState(d % 2**31).randn(n)
            out.append(np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes())
        return pd.Series(out)

    return udf


def hk_class_amps(cls: int, n_segs: int, n_bands: int) -> np.ndarray:
    """Seeded per-class (n_segs, n_bands) continuous amplitude pattern."""
    seed = int.from_bytes(
        hashlib.blake2b(f"hk|{cls}".encode(), digest_size=4).digest(), "little"
    )
    return np.random.RandomState(seed).uniform(0.2, 1.0, (n_segs, n_bands))


def hk_class_signal(
    cls: int,
    sr_hz: int = 16000,
    n_segs: int = 31,
    seg_len: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
) -> np.ndarray:
    """The deterministic broadband waveform for one class (float, |x|<~1):
    band-center sines with the class's per-segment amplitude pattern.
    Shared by the HK (q119) and DTW (q120) corpus synthesizers."""
    edges = np.linspace(fmin, fmax, n_bands + 1)
    centers = (edges[:-1] + edges[1:]) / 2.0
    n = n_segs * seg_len
    t = np.arange(n) / float(sr_hz)
    carriers = np.sin(2.0 * np.pi * centers[:, None] * t[None, :])
    gains = np.repeat(
        hk_class_amps(cls, n_segs, n_bands), seg_len, axis=0
    ).T
    return (gains * carriers).sum(axis=0) / n_bands
