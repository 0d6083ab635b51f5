"""Time-warp-robust audio matching: DTW verify over band-energy features.

The engine's other audio tiers each assume something about TIME:

* exact/CDC dedup (audio_cdc.py) — byte-identical segments;
* landmark fingerprints (audio_fp.py) — stable peak timing (dt in the
  hash), robust to shifts but not to tempo change;
* Haitsma-Kalker BER verify (audio_hk.py) — frame-aligned sequences;
* the stretch tier (q101) — one GLOBAL playback-speed factor absorbed by
  log-band profiles.

None of them survives a LOCAL warp — a repeated phrase, a dropped beat,
variable-speed re-encode — where the two clips align only under an
elastic mapping.  Dynamic time warping (Sakoe & Chiba 1978, the classic
constrained-DP alignment — public method) is the standard primitive for
exactly that regime: normalized alignment cost under a band-constrained
monotone path.

Operator shape (candidates-then-verify, like every other tier):

  1. features: PCM -> Hann frames -> rFFT -> log band energies — ONE
     pass also emits the HK sub-fingerprint words (same band energies,
     zero extra FFT work).
  2. candidates: the HK word equi-join (hk_candidate_pairs).  Words are
     an order-invariant BAG of frame signatures, so a warped copy still
     shares most words even though their ORDER changed — measured >= 18
     of ~30 words under a dup+delete segment warp.  Same hot-word cap.
  3. verify: banded DTW over the log-energy sequences (cosine frame
     cost, Sakoe-Chiba radius), normalized by path length; keep pairs
     with distance <= max_dtw.  Arrow-batched pandas UDF over the small
     feature arrays (~n_frames x n_bands doubles per clip); the PCM
     BLOB never reaches the verify.

Measured separation on the q120 corpus family (32-bit words, 33 bands):
warped-copy DTW <= 0.0033 vs unrelated >= 0.076 (12-class sample; the
17-band variant measured <= 0.0017 vs >= 0.024 over 1 770 inter pairs)
— and the same warped copies read BER ~0.1-0.5 to their source, i.e.
the aligned verify genuinely cannot see them (tests/test_audio_dtw.py
proves the capability gap).

Scale notes: DTW cost is O(n_frames * radius) per candidate pair with
tiny constants (frames ~ clip_seconds * sr / hop; a 1-s clip is a 30x33
float grid).  The quadratic surface is confined to the verify of
candidate pairs produced by the capped word join — never all pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audio import decode_pcm_s16le
from .audio_hk import _band_matrix, hk_candidate_pairs


def band_log_energies(
    x: np.ndarray,
    sr_hz: float,
    frame_len: int = 512,
    hop: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
) -> np.ndarray:
    """float waveform -> (n_frames, n_bands) log band-energy features."""
    if len(x) < frame_len:
        return np.empty((0, n_bands))
    starts = np.arange(0, len(x) - frame_len + 1, hop)
    frames = x[starts[:, None] + np.arange(frame_len)[None, :]]
    spec = np.abs(np.fft.rfft(frames * np.hanning(frame_len), axis=1)) ** 2
    energy = spec @ _band_matrix(frame_len, sr_hz, n_bands, fmin, fmax)
    return np.log(energy + 1e-12)


def dtw_distance(a: np.ndarray, b: np.ndarray, radius: int = 4) -> float:
    """Normalized banded DTW: cosine frame cost, Sakoe-Chiba band of the
    given radius, monotone steps (diag/down/right), total path cost
    divided by (len(a) + len(b)).  Returns 1.0 for empty inputs."""
    n1, n2 = len(a), len(b)
    if n1 == 0 or n2 == 0:
        return 1.0
    if abs(n1 - n2) > radius:
        return 1.0  # no admissible path inside the band
    big = 1e18
    dp = np.full((n1 + 1, n2 + 1), big)
    dp[0, 0] = 0.0
    norms_b = np.linalg.norm(b, axis=1)
    for i in range(1, n1 + 1):
        lo, hi = max(1, i - radius), min(n2, i + radius)
        v = a[i - 1]
        cost = 1.0 - (b[lo - 1 : hi] @ v) / (
            norms_b[lo - 1 : hi] * np.linalg.norm(v) + 1e-12
        )
        for k, j in enumerate(range(lo, hi + 1)):
            dp[i, j] = cost[k] + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
    return float(dp[n1, n2] / (n1 + n2))


def hk_words_and_feats_udf(
    frame_len: int = 512,
    hop: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
):
    """(bytes, sr_hz) -> struct(words array<bigint>, feats array<double>,
    n_frames int): HK sub-fingerprint words AND flattened log-energy
    features from ONE framing/FFT pass (the DTW tier's ingest UDF)."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("words", T.ArrayType(T.LongType())),
                T.StructField("feats", T.ArrayType(T.DoubleType())),
                T.StructField("n_frames", T.IntegerType()),
            ]
        )
    )
    def udf(payload: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
        words_out, feats_out, nf_out = [], [], []
        weights = (1 << np.arange(n_bands - 1)).astype(np.int64)
        for b, sr in zip(payload, sr_hz):
            if b is None or sr is None or len(b) < 4 * frame_len:
                words_out.append([])
                feats_out.append([])
                nf_out.append(0)
                continue
            feats = band_log_energies(
                decode_pcm_s16le(b), float(sr), frame_len, hop, n_bands, fmin, fmax
            )
            energy = np.exp(feats)
            band_diff = energy[:, :-1] - energy[:, 1:]
            bits = (band_diff[1:, :] - band_diff[:-1, :]) > 0
            words_out.append([int(v) for v in bits.astype(np.int64) @ weights])
            feats_out.append([float(v) for v in feats.ravel()])
            nf_out.append(len(feats))
        return pd.DataFrame(
            {"words": words_out, "feats": feats_out, "n_frames": nf_out}
        )

    return udf


def dtw_distance_batch(A: np.ndarray, B: np.ndarray, radius: int = 4) -> np.ndarray:
    """Vectorized DTW over a BATCH of same-shape pairs: A (m, n1, d),
    B (m, n2, d) -> (m,) normalized distances.  Identical recurrence to
    :func:`dtw_distance` (property-tested equal), but the DP wavefront
    advances in lockstep across all m pairs — the Python-level loop is
    n1 * band_width steps per batch instead of per pair (~600x fewer
    interpreter iterations at 30-frame clips), everything else is one
    einsum and elementwise minima."""
    m, n1, _ = A.shape
    n2 = B.shape[1]
    if n1 == 0 or n2 == 0 or abs(n1 - n2) > radius:
        return np.ones(m)
    big = 1e18
    an = A / (np.linalg.norm(A, axis=2, keepdims=True) + 1e-12)
    bn = B / (np.linalg.norm(B, axis=2, keepdims=True) + 1e-12)
    prev = np.full((m, n2 + 1), big)
    prev[:, 0] = 0.0
    for i in range(1, n1 + 1):
        lo, hi = max(1, i - radius), min(n2, i + radius)
        cost = 1.0 - np.einsum("md,mjd->mj", an[:, i - 1], bn[:, lo - 1 : hi])
        cur = np.full((m, n2 + 1), big)
        for k, j in enumerate(range(lo, hi + 1)):
            cur[:, j] = cost[:, k] + np.minimum(
                np.minimum(prev[:, j], prev[:, j - 1]), cur[:, j - 1]
            )
        prev = cur
    return prev[:, n2] / (n1 + n2)


def dtw_verify_udf(n_bands: int = 33, radius: int = 4):
    """(feats1, n1, feats2, n2) -> normalized DTW distance (double).
    Rows are grouped by (n1, n2) inside each Arrow batch and verified
    through the lockstep batch DP (dtw_distance_batch)."""

    @F.pandas_udf(T.DoubleType())
    def udf(
        f1: pd.Series, n1: pd.Series, f2: pd.Series, n2: pd.Series
    ) -> pd.Series:
        out = np.ones(len(f1))
        shapes: dict[tuple[int, int], list[int]] = {}
        for idx, (na, nb) in enumerate(zip(n1, n2)):
            shapes.setdefault((int(na), int(nb)), []).append(idx)
        for (na, nb), idxs in shapes.items():
            if na == 0 or nb == 0:
                continue  # stays 1.0 (empty input contract)
            A = np.stack(
                [np.asarray(f1.iloc[i], dtype=np.float64).reshape(na, n_bands)
                 for i in idxs]
            )
            B = np.stack(
                [np.asarray(f2.iloc[i], dtype=np.float64).reshape(nb, n_bands)
                 for i in idxs]
            )
            out[idxs] = dtw_distance_batch(A, B, radius)
        return pd.Series(out)

    return udf


def dtw_neardup(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    sr_col: str = "sr_hz",
    max_dtw: float = 0.015,
    word_cap: int = 64,
    radius: int = 4,
    frame_len: int = 512,
    hop: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
) -> DataFrame:
    """Warp-robust audio near-dup pairs: HK-word candidates (order-
    invariant under warping) -> banded-DTW verify.  Returns (id1, id2,
    n_shared, dtw_dist)."""
    ingest = hk_words_and_feats_udf(frame_len, hop, n_bands, fmin, fmax)
    fps = df.select(
        F.col(id_col).alias("rid"),
        ingest(F.col(bytes_col), F.col(sr_col)).alias("s"),
    ).select("rid", "s.words", "s.feats", "s.n_frames").persist()
    cand = hk_candidate_pairs(
        fps.select("rid", F.col("words").alias("hk_fp")),
        "rid",
        "hk_fp",
        word_cap=word_cap,
    )
    f1 = fps.select(
        F.col("rid").alias("id1"),
        F.col("feats").alias("f1"),
        F.col("n_frames").alias("nf1"),
    )
    f2 = fps.select(
        F.col("rid").alias("id2"),
        F.col("feats").alias("f2"),
        F.col("n_frames").alias("nf2"),
    )
    verify = dtw_verify_udf(n_bands, radius)
    return (
        cand.join(f1, "id1")
        .join(f2, "id2")
        .withColumn("dtw_dist", verify("f1", "nf1", "f2", "nf2"))
        .filter(F.col("dtw_dist") <= max_dtw)
        .select("id1", "id2", "n_shared", F.round("dtw_dist", 6).alias("dtw_dist"))
    )


def synth_warped_pcm_udf(
    n_classes: int = 100,
    sr_hz: int = 16000,
    n_segs: int = 31,
    seg_len: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 6000.0,
    jitter_amp: float = 0.002,
):
    """q120 corpus: class waveform per id (= synth_hk_pcm_udf's family);
    ids >= 1_000_000 are LOCALLY WARPED noisy copies — one seeded segment
    duplicated and another deleted (total length preserved), plus ~35 dB
    jitter.  The warp breaks frame alignment (measured BER 0.15-0.53 vs
    the source — past the q119 verify) while DTW recovers the elastic
    match; `id % n_classes` stays the SQL-expressible ground truth."""
    from .audio_hk import hk_class_signal

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
                rng = np.random.RandomState(d % 2**31)
                i_dup, i_del = rng.choice(n_segs, 2, replace=False)
                segs = [x[i * seg_len : (i + 1) * seg_len] for i in range(n_segs)]
                warped = []
                for i, s in enumerate(segs):
                    if i == i_del:
                        continue
                    warped.append(s)
                    if i == i_dup:
                        warped.append(s)
                x = np.concatenate(warped) + jitter_amp * rng.randn(n)
            out.append(np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes())
        return pd.Series(out)

    return udf
