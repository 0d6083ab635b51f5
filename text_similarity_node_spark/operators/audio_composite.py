"""Composite-transform audio near-duplicate tier: pitch x stretch x echo.

Closure of the robustness family over a COMPOSITION of three transform
axes that previous tiers each cover only alone:

* PITCH SHIFT (q121): every frequency x 2^(k/12) — an exact integer
  translation of the semitone band profile;
* TIME STRETCH (q101): playback speed 1+s — a further UNIFORM frequency
  scale; for |s| <= ~2.9% the extra offset 12*log2(1+s) < 0.5 semitone,
  so every tone stays inside its (k-translated) semitone band and the
  integer translation picture is unchanged;
* ECHO (q124): a 2-tap room channel y = (x + g*x[.-d])/(1+g) — a
  CONVOLUTIVE per-frequency gain |H(f)| in [(1-g)/(1+g), 1] that leaves
  every spectral peak in place but rescales per-tone ENERGIES by up to
  ((1+g)/(1-g))^2 (8.4 dB at g = 0.45).

Why the q121 machinery alone does not close this: its verify is the
best-lag normalized cross-correlation of the band-energy profiles, and
the echo's independent per-tone gains can push a true pair's cosine to
~0.66 (measured worst case with |H|^2 down to 0.144) — far below any
usable threshold.  The candidate key, however, survives all three
transforms: top-3 band MEMBERSHIP is preserved (each tone keeps
>= 20 dB over the noise floor even at the worst channel gain), and the
pairwise index differences are translation-invariant.

So this tier replaces the amplitude-sensitive NCC verify with a RANK
verify that is provably invariant to ANY per-band gain that preserves
top-3 membership:

  1. candidates — the shift-invariant top-3 difference key
     (audio_pitch.shift_invariant_key), hot keys metered;
  2. verify — (a) the two sorted top-3 band-index triples must be EXACT
     integer translates (all three pairwise differences equal), which
     simultaneously recovers the translation = planted pitch distance
     in semitones; (b) |shift| <= max_shift; (c) each clip's top-3
     bands must carry >= min_concentration of its total profile energy
     (L2 space: sum of the 3 squared profile entries, >= ~0.99 for a
     chord through any 2-tap channel vs ~0.1 for 60-band noise) — the
     teeth that reject noise-floor clips whose arbitrary top-3 happen
     to collide in the key space.

Everything is JVM-side after the one profile UDF pass; the BLOB never
shuffles.  Reference semantics: the rank verify generalizes the cosine
kernel's dominant-direction agreement
(/root/reference/src/algorithms/vector_based.cpp:86-123) to the
per-band-gain-invariant statistic that the composite channel demands.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audio_pitch import (
    pitch_class_bands,
    planted_shift,
    semitone_profile_udf,
    shift_invariant_key,
)


def top3_struct(profile) -> F.Column:
    """array<struct(neg double, band int)> of the 3 highest-energy bands
    (ascending by -energy, ties by band index — deterministic and
    preserved under uniform translation)."""
    return F.slice(
        F.array_sort(
            F.transform(
                profile,
                lambda v, j: F.struct((-v).alias("neg"), j.alias("band")),
            )
        ),
        1,
        3,
    )


def top3_bands(t3) -> F.Column:
    """Sorted band indices of a top3_struct — the membership triple."""
    return F.array_sort(F.transform(t3, lambda s: s["band"].cast("long")))


def top3_concentration(t3) -> F.Column:
    """Fraction of total profile energy (L2 space) in the top-3 bands.
    The profile is L2-normalized, so this is just the sum of the three
    squared entries."""
    return F.aggregate(
        t3, F.lit(0.0), lambda acc, s: acc + s["neg"] * s["neg"]
    )


def composite_pairs(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    sr_col: str = "sr_hz",
    n_bands: int = 60,
    f_lo: float = 200.0,
    max_shift: int = 8,
    min_concentration: float = 0.5,
    key_cap: int = 4096,
    return_metrics: bool = False,
):
    """Pitch+stretch+echo-robust near-dup pairs: semitone band profile
    (one map over the BLOB) -> shift-invariant top-3-difference key
    equi-join -> rank verify (exact top-3 translation + concentration
    gate).  Returns (id1, id2, shift_semitones) where shift is id2's
    pitch minus id1's in semitones, recovered from the waveforms.

    ``max_shift`` must cover the worst-case PAIRWISE shift: with
    per-clip shifts in [-m, m], two copies of one recording can sit 2m
    apart (the q121 lesson), so the default is 8 = 2 x the planted
    per-clip range of the driver corpus.

    Skew discipline mirrors audio_pitch_pairs: deterministic
    content-derived key, hot keys metered via ``key_cap`` (with
    ``return_metrics`` the dropped keys come back as (inv_key, n_docs)
    rows); only skinny (id, key, 3 longs, 1 double) rows shuffle."""
    prof = df.select(
        F.col(id_col).alias("rid"),
        semitone_profile_udf(n_bands, f_lo)(
            F.col(bytes_col), F.col(sr_col)
        ).alias("profile"),
    ).select(
        "rid",
        shift_invariant_key(F.col("profile")).alias("inv_key"),
        top3_struct(F.col("profile")).alias("t3"),
    ).select(
        "rid",
        "inv_key",
        top3_bands(F.col("t3")).alias("bands"),
        top3_concentration(F.col("t3")).alias("conc"),
    )
    prof = prof.persist()
    counts = prof.groupBy("inv_key").agg(F.count(F.lit(1)).alias("n_docs"))
    hot = counts.filter(F.col("n_docs") > key_cap)
    kept = prof.join(F.broadcast(hot.select("inv_key")), "inv_key", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    d0 = F.col("b.bands")[0] - F.col("a.bands")[0]
    d1 = F.col("b.bands")[1] - F.col("a.bands")[1]
    d2 = F.col("b.bands")[2] - F.col("a.bands")[2]
    pairs = (
        a.join(
            b,
            (F.col("a.inv_key") == F.col("b.inv_key"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .filter(
            (d0 == d1)
            & (d1 == d2)
            & (F.abs(d0) <= max_shift)
            & (F.col("a.conc") >= min_concentration)
            & (F.col("b.conc") >= min_concentration)
        )
        .select(
            F.col("a.rid").alias("id1"),
            F.col("b.rid").alias("id2"),
            d0.cast("int").alias("shift_semitones"),
        )
    )
    if return_metrics:
        return pairs, hot
    return pairs


# ---------------------------------------------------------------------------
# deterministic corpus for the driver query (q126)
# ---------------------------------------------------------------------------


def planted_stretch_pct(doc_id: int) -> float:
    """Stretch planted on a copy row (ids >= 1_000_000): 1.5 * j percent
    with j = ((d / 6) % 3) - 1 in {-1, 0, 1}; 0 for base rows.  1.5%
    keeps every tone 0.24 semitone inside its band (12*log2(1.015) =
    0.258 offset from the 0.5 center), so the pitch translation stays
    exactly integer."""
    if doc_id < 1_000_000:
        return 0.0
    return 1.5 * (((doc_id - 1_000_000) // 6) % 3 - 1)


def synth_composite_pcm_udf(
    n_classes: int = 200,
    sr_hz: int = 16000,
    f_lo: float = 200.0,
    noise_amp: float = 0.003,
):
    """Deterministic 1-s pcm_s16le chord per id, the q121 corpus extended
    with a planted TIME STRETCH: base rows are byte-identical per class
    (pitch_class_bands chord, phases 0, no noise); copy rows (id >=
    1_000_000, planted at source % 6 == 0) play the same chord at
    frequency x 2^(k/12) x (1 + s/100) with k = planted_shift and
    s = planted_stretch_pct, seeded phases and ~38 dB noise.  The echo
    axis is applied OUTSIDE the synth (audio.echo_pcm_udf on the copy
    bytes) so the composite is an honest waveform transform chain.
    Frequencies are rounded to integer Hz = exact 1-s rFFT bins;
    congruence mod n_classes is the SQL ground truth."""
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
            stretch = 1.0 + planted_stretch_pct(d) / 100.0
            bands = pitch_class_bands(cls)
            x = np.zeros(sr_hz)
            if d >= 1_000_000:
                seed = int.from_bytes(
                    hashlib.blake2b(
                        f"composite|{d}".encode(), digest_size=4
                    ).digest(),
                    "little",
                )
                rs = np.random.RandomState(seed)
                phases = rs.uniform(0, 2 * np.pi, 3)
                noise = noise_amp * rs.randn(sr_hz)
            else:
                phases = np.zeros(3)
                noise = 0.0
            for i, (amp, band) in enumerate(zip(amps, bands)):
                freq = round(f_lo * 2.0 ** ((band + 0.5 + k) / 12.0) * stretch)
                x = x + amp * np.sin(2 * np.pi * freq * t + phases[i])
            x = x / 2.2 + noise
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf
