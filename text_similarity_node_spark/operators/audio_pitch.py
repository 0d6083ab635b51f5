"""Pitch-shift-robust audio near-duplicate tier.

The transform-axis the existing audio tiers do NOT cover: a PITCH SHIFT
(key change without tempo change — every frequency multiplied by a
constant factor p) moves every spectral peak, so it breaks the landmark
(f1, f2, dt) constellation hash (q32/q51), flips the Haitsma-Kalker
band-difference sign bits (q119), and translates the whole band-energy
profile past the ±one-band tolerance the stretch tier (q101) absorbs.
In LOG-frequency, however, multiplication is a pure TRANSLATION: with
bands spaced at one semitone (ratio 2^(1/12)), a k-semitone shift moves
the band-energy profile by exactly k integer slots.  That turns
pitch-robust matching into two classic relational pieces:

  1. candidates — a SHIFT-INVARIANT equi-join key: the pairwise
     index DIFFERENCES of the profile's top-3 energy bands.  Uniform
     translation adds the same constant to every dominant-band index,
     so the difference pattern (b2-b1, b3-b1) is exactly preserved;
     clips sharing it meet in one hash join (hot keys metered, the
     repo-wide no-silent-caps policy).
  2. verify — normalized cross-correlation of the two profiles over
     integer band shifts s in [-max_shift, +max_shift], entirely
     JVM-side (slice + zip_with + aggregate per lag; 2·max_shift+1
     lags over ≤ n_bands doubles — whole-stage-codegen arithmetic).
     The argmax lag IS the recovered key distance in semitones, so
     the operator reports (best cosine, shift) per pair.

This is the log-frequency translation trick behind chroma/shift-match
audio retrieval (public technique; see e.g. Serra et al., chroma
cross-correlation).  Reference semantics anchored to the cosine kernel
(#9, /root/reference/src/algorithms/vector_based.cpp:86-123): the
verify is that kernel over band-energy vectors, generalized to the max
over a small set of integer alignments.

Scale notes: the BLOB is read once in the profile UDF and never
shuffles; only (id, key, 60 doubles) rows move.  The candidate join is
a single equi-join on a content-derived deterministic key — recall 1.0
whenever the dominant-band SET survives the corruption model (tested),
no probabilistic banding involved.  Hot keys (silence, boilerplate
tones) are dropped WITH metrics via ``key_cap``, like every other hash
join in the repo.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def semitone_edges(f_lo: float, n_bands: int, bands_per_octave: int = 12) -> np.ndarray:
    """Geometric band edges at ratio 2^(1/bands_per_octave)."""
    return f_lo * 2.0 ** (np.arange(n_bands + 1) / float(bands_per_octave))


def semitone_profile_udf(
    n_bands: int = 60,
    f_lo: float = 200.0,
    bands_per_octave: int = 12,
):
    """pcm_s16le bytes (+ sample rate) -> L2-normalized per-band energy
    profile over ``n_bands`` semitone-spaced bands starting at ``f_lo``.
    Same construction as audio_fp.spectral_profile_udf but with the
    band RATIO pinned to 2^(1/12) so an integer-semitone pitch shift is
    an integer slot translation of the output array."""
    edges = semitone_edges(f_lo, n_bands, bands_per_octave)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def udf(payload: pd.Series, sr_hz: pd.Series) -> pd.Series:
        out = []
        for buf, sr in zip(payload, sr_hz):
            if buf is None or len(buf) < 4:
                out.append([0.0] * n_bands)
                continue
            x = np.frombuffer(buf, dtype="<i2").astype(np.float64)
            spec = np.abs(np.fft.rfft(x)) ** 2
            freqs = np.arange(spec.shape[0]) * (float(sr) / x.shape[0])
            idx = np.searchsorted(edges, freqs, side="right")
            e = np.zeros(n_bands)
            valid = (idx >= 1) & (idx <= n_bands)
            np.add.at(e, idx[valid] - 1, spec[valid])
            n = np.linalg.norm(e)
            out.append((e / n).tolist() if n > 0 else e.tolist())
        return pd.Series(out)

    return udf


def shift_invariant_key(profile) -> F.Column:
    """Top-3-band difference pattern, packed to one BIGINT:
    (b2-b1) * 4096 + (b3-b1) where b1 < b2 < b3 are the INDICES of the
    three highest-energy bands.  Invariant under uniform index
    translation (pitch shift in semitone bands); ties broken by band
    index (deterministic, and translation preserves tie order)."""
    top3 = F.slice(
        F.array_sort(
            F.transform(
                profile,
                lambda v, j: F.struct((-v).alias("neg"), j.alias("band")),
            )
        ),
        1,
        3,
    )
    bands = F.array_sort(F.transform(top3, lambda s: s["band"].cast("long")))
    return (
        (bands[1] - bands[0]) * F.lit(4096).cast("long") + (bands[2] - bands[0])
    )


def best_shift_cosine(p1, p2, n_bands: int, max_shift: int) -> F.Column:
    """struct(cos_sim double, shift int): max over integer band lags s
    in [-max_shift, max_shift] of the normalized cross-correlation of
    the overlapping slices, and the argmax lag.  ``shift`` is the pitch
    of clip 2 relative to clip 1 in band units (p2[i + s] aligns with
    p1[i]).  Pure JVM: one (slice, zip_with, aggregate) triple per lag.
    Ties (never at the operating point: planted corpora separate best
    from runner-up by >0.4) resolve to the smaller |shift| then the
    smaller shift, deterministically."""

    def _ncc(s: int) -> F.Column:
        width = n_bands - abs(s)
        if s >= 0:
            a = F.slice(p1, 1, width)
            b = F.slice(p2, 1 + s, width)
        else:
            a = F.slice(p1, 1 - s, width)
            b = F.slice(p2, 1, width)
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        na = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
        nb = F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v)
        return F.when(
            (na > 0) & (nb > 0), dot / F.sqrt(na * nb)
        ).otherwise(F.lit(0.0))

    lags = sorted(range(-max_shift, max_shift + 1), key=lambda s: (abs(s), s))
    candidates = F.array(
        *[
            F.struct(_ncc(s).alias("cos_sim"), F.lit(s).alias("shift"))
            for s in lags
        ]
    )
    # array_max on structs orders by first field; earlier array position
    # (smaller |shift|) wins exact ties because array_max keeps the first
    # maximal element encountered is NOT guaranteed — so order by
    # (cos_sim, -|shift|-ish) explicitly via a sortable struct.
    ranked = F.transform(
        candidates,
        lambda c: F.struct(
            c["cos_sim"].alias("cos_sim"),
            (-F.abs(c["shift"])).alias("neg_abs"),
            (-c["shift"]).alias("neg_shift"),
            c["shift"].alias("shift"),
        ),
    )
    best = F.array_max(ranked)
    return F.struct(best["cos_sim"].alias("cos_sim"), best["shift"].alias("shift"))


def audio_pitch_pairs(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    sr_col: str = "sr_hz",
    n_bands: int = 60,
    f_lo: float = 200.0,
    max_shift: int = 4,
    threshold: float = 0.9,
    key_cap: int = 4096,
    return_metrics: bool = False,
):
    """Pitch-shift-robust near-dup pairs: semitone band profile (one map
    over the BLOB) -> shift-invariant top-3-difference key equi-join ->
    best-lag normalized-cross-correlation verify.  Returns (id1, id2,
    cos_sim, shift_semitones) with cos_sim >= threshold; shift is id2's
    pitch minus id1's in semitones, recovered from the waveforms.

    Skew discipline mirrors audio_profile_pairs: the key is
    content-derived and deterministic, hot keys are metered via
    ``key_cap`` (with ``return_metrics`` the dropped keys come back as
    (inv_key, n_docs) rows); only skinny profile rows shuffle."""
    prof = df.select(
        F.col(id_col).alias("rid"),
        semitone_profile_udf(n_bands, f_lo)(
            F.col(bytes_col), F.col(sr_col)
        ).alias("profile"),
    ).withColumn("inv_key", shift_invariant_key(F.col("profile")))
    prof = prof.persist()
    counts = prof.groupBy("inv_key").agg(F.count(F.lit(1)).alias("n_docs"))
    hot = counts.filter(F.col("n_docs") > key_cap)
    kept = prof.join(F.broadcast(hot.select("inv_key")), "inv_key", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    best = best_shift_cosine(
        F.col("a.profile"), F.col("b.profile"), n_bands, max_shift
    )
    pairs = (
        a.join(
            b,
            (F.col("a.inv_key") == F.col("b.inv_key"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.col("a.rid").alias("id1"),
            F.col("b.rid").alias("id2"),
            best.alias("best"),
        )
        .select(
            "id1",
            "id2",
            F.round(F.col("best.cos_sim"), 6).alias("cos_sim"),
            F.col("best.shift").alias("shift_semitones"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    if return_metrics:
        return pairs, hot
    return pairs


# ---------------------------------------------------------------------------
# deterministic corpus for the driver query (q121)
# ---------------------------------------------------------------------------


def pitch_class_bands(cls: int) -> tuple[int, int, int]:
    """Deterministic 3-band chord for a class, built so that NO two
    classes are transpositions of each other within any shift: the
    difference pattern (d1, d2) is UNIQUE per class (d1 = 5 + cls % 14,
    d2 = d1 + 5 + (cls // 14) % 15 — injective for cls < 210), so
    distinct classes can never share the shift-invariant key nor align
    under any lag.  Base band b1 in [6, 13] varies with the class to
    spread absolute positions."""
    d1 = 5 + cls % 14
    d2 = d1 + 5 + (cls // 14) % 15
    b1 = 6 + (cls * 3) % 8
    return b1, b1 + d1, b1 + d2


def planted_shift(doc_id: int) -> int:
    """The pitch shift planted on a copy row (ids >= 1_000_000):
    k = ((d / 6) % 9) - 4 in [-4, 4], 0 for base rows.  Copies exist
    only at source % 6 == 0 so the integer division is exact — the SQL
    oracle restates this closed form."""
    if doc_id < 1_000_000:
        return 0
    return ((doc_id - 1_000_000) // 6) % 9 - 4


def synth_pitch_pcm_udf(
    n_classes: int = 200,
    sr_hz: int = 16000,
    f_lo: float = 200.0,
    noise_amp: float = 0.003,
):
    """Deterministic 1-s pcm_s16le chord per id: class = id % n_classes
    keys three tones at semitone-band centers (pitch_class_bands) with
    fixed distinct amplitudes (1.0 / 0.62 / 0.38 — top-3 energy order
    is unambiguous).  Copy rows (id >= 1_000_000, planted at source
    id % 6 == 0) play the SAME chord pitch-shifted by k semitones
    (planted_shift) with a seeded phase offset and ~38 dB noise.  Tone
    frequencies are rounded to integer Hz — exact rFFT bins at 1 s /
    16 kHz, so band energies are clean spikes.  1_000_000 % n_classes
    must be 0: id congruence mod n_classes is the SQL ground truth
    (the q32/q101 congruence-oracle construction)."""
    if 1_000_000 % n_classes != 0:
        raise ValueError("n_classes must divide 1_000_000 (congruence oracle)")
    if n_classes > 210:
        raise ValueError("pitch_class_bands is injective only below 210 classes")
    amps = (1.0, 0.62, 0.38)

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        t = np.arange(sr_hz) / float(sr_hz)
        for d in doc_id:
            d = int(d)
            cls = d % n_classes
            k = planted_shift(d)
            bands = pitch_class_bands(cls)
            x = np.zeros(sr_hz)
            if d >= 1_000_000:
                seed = int.from_bytes(
                    hashlib.blake2b(f"pitch|{d}".encode(), digest_size=4).digest(),
                    "little",
                )
                rs = np.random.RandomState(seed)
                phases = rs.uniform(0, 2 * np.pi, 3)
                noise = noise_amp * rs.randn(sr_hz)
            else:
                phases = np.zeros(3)
                noise = 0.0
            for i, (amp, band) in enumerate(zip(amps, bands)):
                freq = round(f_lo * 2.0 ** ((band + 0.5 + k) / 12.0))
                x = x + amp * np.sin(2 * np.pi * freq * t + phases[i])
            x = x / 2.2 + noise
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf
