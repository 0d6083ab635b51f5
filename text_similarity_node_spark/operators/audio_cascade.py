"""Tiered AUDIO dedup cascade — the waveform analog of the text cascade
(q49): run the cheapest matcher first, remove what it catches, and hand
only the residual to each successively more transform-tolerant (and more
expensive) tier, with per-clip TIER ATTRIBUTION in the output.

Tier ladder (each tier's depth is proven by its own driver query; the
cascade proves the COMPOSITION — ordering, removal semantics, and that
every tier really is blind to the transforms the later tiers catch):

  1. ``exact``    — md5 over the raw payload (byte-identical re-uploads);
  2. ``landmark`` — spectral-landmark candidates (gain-invariant peak
     constellations, operators/audio_fp.py) verified by BEST-GAIN SNR:
     catches volume-rescaled re-encodes, rejects warped/shifted-pitch
     copies (no single gain aligns them);
  3. ``dtw``      — semitone-band spike-mask word candidates verified by
     banded DTW over semitone log-energy frames (operators/audio_dtw.py
     machinery): catches locally time-warped copies (dup/deleted
     segments) that fail every aligned verify;
  4. ``pitch``    — shift-invariant band-difference keys + best-lag NCC
     (operators/audio_pitch.py): catches key-changed copies, the
     transform every earlier tier is provably blind to (landmark hashes
     move in frequency, spike masks translate, no gain fixes it).

The cascade ordering is the scale story, exactly as in the text cascade:
each tier shrinks the next tier's input, the expensive elastic/shifted
verifies only ever see what the cheap exact/aligned passes could not
claim, and every candidate stage is the already-audited capped/metered
equi-join of its operator — never all pairs.

Reference ground: the reference library computes pairwise similarity one
metric at a time (/root/reference/src/index.cpp dispatch); the cascade is
the pipeline composition a dedup system builds ON TOP of such kernels —
semantics anchored to the same candidates-then-verify discipline as
plans/pipeline.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audio_pitch import pitch_class_bands, semitone_edges

# ---------------------------------------------------------------------------
# tier 1: exact (md5 star pairs)
# ---------------------------------------------------------------------------


def exact_star_pairs(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Byte-identical pairs in STAR shape: (group-min id, other id) per
    md5 group — linear in group size (never the quadratic all-pairs
    expansion), one shuffle on the hash, window-min in-partition; the
    same plan as operators/dedup.exact_dedup."""
    from pyspark.sql.window import Window

    h = df.select(
        F.col(id_col).alias("rid"), F.md5(F.col(bytes_col)).alias("h")
    )
    w = Window.partitionBy("h")
    return (
        h.withColumn("id1", F.min("rid").over(w))
        .filter(F.col("rid") != F.col("id1"))
        .select("id1", F.col("rid").alias("id2"))
    )


# ---------------------------------------------------------------------------
# tier 2: landmark candidates + best-gain SNR verify
# ---------------------------------------------------------------------------


def landmark_snr_pairs(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    sr_col: str = "sr_hz",
    snr_threshold_db: float = 25.0,
    min_matches: int = 2,
    **landmark_kwargs,
) -> DataFrame:
    """Gain-robust aligned near-dup pairs: landmark fingerprint
    candidates (peak selection is relative, so a constant gain cancels —
    the q71-proven invariance) -> best-gain SNR verify.  A volume-scaled
    re-encode fits its gain exactly (SNR limited only by rounding/noise,
    measured ~35-45 dB); a time-warped copy shares landmark hashes from
    its intact segments but NO scalar gain aligns the permuted
    envelopes (measured <= ~12 dB), so the verify is what separates the
    aligned tier from the elastic tier below it."""
    from .audio import pairwise_snr_bestgain_udf
    from .audio_fp import audio_fingerprint_pairs

    pairs = audio_fingerprint_pairs(
        df, id_col, bytes_col, sr_col, min_matches=min_matches, **landmark_kwargs
    )
    b1 = df.select(F.col(id_col).alias("id1"), F.col(bytes_col).alias("_b1"))
    b2 = df.select(F.col(id_col).alias("id2"), F.col(bytes_col).alias("_b2"))
    return (
        pairs.join(b1, "id1")
        .join(b2, "id2")
        .withColumn(
            "snr_db", pairwise_snr_bestgain_udf(F.col("_b1"), F.col("_b2"))
        )
        .filter(F.col("snr_db") >= snr_threshold_db)
        .select("id1", "id2")
    )


# ---------------------------------------------------------------------------
# tier 3: semitone spike-mask candidates + semitone-band DTW verify
# ---------------------------------------------------------------------------


def semitone_words_feats_udf(
    n_bands: int = 56,
    f_lo: float = 200.0,
    frame_len: int = 2048,
    hop: int = 2048,
    mask_rel: float = 0.05,
):
    """(bytes pcm_s16le, sr_hz) -> struct(words, feats, n_frames): per
    frame, energies over SEMITONE-spaced log-frequency bands (ratio
    2^(1/12), audio_pitch.semitone_edges) plus a SPIKE-MASK word — bit b
    set iff band b's energy exceeds ``mask_rel`` x the frame max.

    Why semitone bands and a membership mask (vs the linear HK bands /
    temporal-difference bits of audio_dtw's ingest): tonal content one
    semitone apart stays SEPARABLE (linear 33-band splitting merges
    low-frequency semitones into one band, so near-miss corpora would
    collide), the mask is invariant to any per-frame gain (relative
    threshold), and a local time warp permutes frames without touching
    their masks — the word BAG survives dup/deleted segments exactly
    like the HK word bag does.  One rFFT batch + one matmul per clip;
    the BLOB never leaves this UDF."""
    if n_bands > 63:
        raise ValueError("n_bands must be <= 63 (mask bits pack in int64)")

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
        from .audio import decode_pcm_s16le

        edges = semitone_edges(f_lo, n_bands)
        weights = (1 << np.arange(n_bands)).astype(np.int64)
        words_out, feats_out, nf_out = [], [], []
        for b, sr in zip(payload, sr_hz):
            if b is None or sr is None or len(b) < 2 * frame_len:
                words_out.append([])
                feats_out.append([])
                nf_out.append(0)
                continue
            x = decode_pcm_s16le(b)
            starts = np.arange(0, len(x) - frame_len + 1, hop)
            frames = x[starts[:, None] + np.arange(frame_len)[None, :]]
            spec = np.abs(np.fft.rfft(frames * np.hanning(frame_len), axis=1)) ** 2
            freqs = np.arange(spec.shape[1]) * (float(sr) / frame_len)
            band = np.searchsorted(edges, freqs, side="right") - 1
            ok = (band >= 0) & (band < n_bands)
            m = np.zeros((spec.shape[1], n_bands))
            m[np.nonzero(ok)[0], band[ok]] = 1.0
            energy = spec @ m
            mask = energy > (mask_rel * energy.max(axis=1, keepdims=True))
            words_out.append([int(v) for v in mask.astype(np.int64) @ weights])
            # mean-center each frame's log energies (audio_subseq.py does
            # the same, for the same reason): the shared 1e-12 floor on
            # empty bands drives raw-log frame cosines toward 1 and
            # collapses the DTW margin, especially on content with many
            # silent bands
            feats = np.log(energy + 1e-12)
            feats -= feats.mean(axis=1, keepdims=True)
            feats_out.append([float(v) for v in feats.ravel()])
            nf_out.append(energy.shape[0])
        return pd.DataFrame(
            {"words": words_out, "feats": feats_out, "n_frames": nf_out}
        )

    return udf


def semitone_dtw_pairs(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    sr_col: str = "sr_hz",
    max_dtw: float = 0.15,
    word_cap: int = 64,
    radius: int = 3,
    n_bands: int = 56,
    f_lo: float = 200.0,
    frame_len: int = 2048,
    hop: int = 2048,
) -> DataFrame:
    """Warp-robust pairs over SEMITONE-band features: spike-mask word
    equi-join candidates (order-invariant under warping, hot words
    anti-joined away with the hk word-cap machinery) -> banded-DTW
    verify (audio_dtw.dtw_verify_udf, lockstep-batched).  The semitone
    variant of operators/audio_dtw.dtw_neardup, used where the corpus
    distinguishes content at semitone resolution."""
    from .audio_dtw import dtw_verify_udf
    from .audio_hk import hk_candidate_pairs

    ingest = semitone_words_feats_udf(n_bands, f_lo, frame_len, hop)
    fps = (
        df.select(
            F.col(id_col).alias("rid"),
            ingest(F.col(bytes_col), F.col(sr_col)).alias("s"),
        )
        .select("rid", "s.words", "s.feats", "s.n_frames")
        .persist()
    )
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
        .select("id1", "id2")
    )


# ---------------------------------------------------------------------------
# the cascade
# ---------------------------------------------------------------------------


def audio_dedup_cascade(
    df: DataFrame,
    id_col: str,
    tiers,
) -> DataFrame:
    """Run ``tiers`` — a list of ``(name, fn)`` where ``fn`` maps a
    clips DataFrame to verified pairs ``(id1 < id2)`` — as a removal
    cascade: tier i sees only what tiers 1..i-1 did not claim; a clip
    matched to one or more smaller REMAINING ids is removed with
    ``kept_id`` = its smallest matched partner and ``tier`` = i.

    Star contract (documented, matches every tier shipped here): each
    tier's candidate stage pairs a duplicate DIRECTLY with its eventual
    keeper, so min-partner attribution needs no per-tier transitive
    closure.  A tier whose matches can chain (dup only reachable via
    another dup) should run connected components inside its pair fn —
    operators/components.py — before returning.

    Returns (clip_id, kept_id, tier, tier_name).  Scale: removal is a
    broadcast-or-shuffle left_anti on ids per tier; the input should
    arrive persisted so each tier's feature UDF reads the cached
    payloads rather than re-deriving them."""
    removed_parts = []
    for i, (name, fn) in enumerate(tiers, start=1):
        # Rebuild `remaining` from the (persisted) input and a FLAT union
        # of the persisted per-tier removal sets instead of chaining
        # anti-joins tier over tier: chained lineage compounds through
        # every reference each tier's pair fn makes (join sides,
        # candidate/verify branches), and the logical plan grows
        # exponentially in the number of tiers — constant-depth lineage
        # here keeps a 10-tier cascade plannable.
        if removed_parts:
            gone = removed_parts[0].select(F.col("clip_id").alias(id_col))
            for part in removed_parts[1:]:
                gone = gone.unionByName(
                    part.select(F.col("clip_id").alias(id_col))
                )
            remaining = df.join(gone, id_col, "left_anti")
        else:
            remaining = df
        pairs = fn(remaining)
        # localCheckpoint (the components.py per-iteration pattern)
        # rather than persist: an InMemoryRelation still REPRINTS and
        # RE-PLANS its whole child subtree at every reference, so with
        # persist alone the logical plan compounds through the tiers
        # even though execution reuses the cache; truncating lineage
        # keeps planner work linear in the number of tiers.  The
        # checkpointed tables are tiny (one row per removed clip).
        removed = (
            pairs.groupBy(F.col("id2").alias("clip_id"))
            .agg(F.min("id1").alias("kept_id"))
            .withColumn("tier", F.lit(i).cast("int"))
            .withColumn("tier_name", F.lit(name))
            .localCheckpoint()
        )
        removed_parts.append(removed)
    out = removed_parts[0]
    for part in removed_parts[1:]:
        out = out.unionByName(part)
    return out


def default_audio_tiers(
    bytes_col: str = "bytes",
    sr_col: str = "sr_hz",
    id_col: str = "doc_id",
    snr_threshold_db: float = 25.0,
    max_dtw: float = 0.15,
    pitch_threshold: float = 0.9,
    landmark_kwargs: dict | None = None,
    hash_cap: int = 64,
    word_cap: int = 64,
    key_cap: int = 4096,
):
    """The shipped 4-tier ladder (exact -> landmark -> dtw -> pitch).

    The cap knobs pass through to each tier's hot-key metering.  Note
    the cap SEMANTICS axis vs the streaming cascade: batch caps count
    keys over the WHOLE corpus, the stream over each arrival prefix
    (per-batch + learned hot store), so batch==stream equality is only
    contractual when no cap fires on either side — soak tests pin the
    caps high for exactly that reason."""
    from .audio_pitch import audio_pitch_pairs

    lkw = landmark_kwargs or dict(
        frame_len=4096, hop=2048, peaks_per_frame=3, fanout=2, freq_quant_hz=1.0
    )
    return [
        ("exact", lambda d: exact_star_pairs(d, id_col, bytes_col)),
        (
            "landmark",
            lambda d: landmark_snr_pairs(
                d, id_col, bytes_col, sr_col,
                snr_threshold_db=snr_threshold_db, hash_cap=hash_cap, **lkw,
            ),
        ),
        (
            "dtw",
            lambda d: semitone_dtw_pairs(
                d, id_col, bytes_col, sr_col, max_dtw=max_dtw,
                word_cap=word_cap,
            ),
        ),
        (
            "pitch",
            lambda d: audio_pitch_pairs(
                d, id_col, bytes_col, sr_col, threshold=pitch_threshold,
                key_cap=key_cap,
            ).select("id1", "id2"),
        ),
    ]


# ---------------------------------------------------------------------------
# deterministic corpus for the driver query (q122)
# ---------------------------------------------------------------------------


def cascade_transform(src: int) -> int:
    """Transform planted on the copy of source ``src`` (copies exist only
    for src < 200 and src % 4 == 0, i.e. at most ONE copy per class —
    same-class same-transform copies would legitimately match EACH OTHER
    at an earlier tier than their keeper and break closed-form
    attribution): t = (src // 4) % 4 -> 0 exact, 1 gain, 2 warp,
    3 pitch."""
    return (src // 4) % 4


def cascade_pitch_shift(src: int) -> int:
    """Nonzero semitone shift for t=3 copies: k in [-4,4] \\ {0}."""
    k_idx = (src // 16) % 8
    return k_idx - 4 + (1 if k_idx >= 4 else 0)


def synth_cascade_pcm_udf(
    n_classes: int = 200,
    sr_hz: int = 16000,
    n_segs: int = 8,
    f_lo: float = 200.0,
    noise_amp: float = 0.002,
):
    """Deterministic 1-s pcm_s16le clip per id for the cascade corpus.

    Base rows: class = id % n_classes keys a 3-tone chord at semitone
    band centers (audio_pitch.pitch_class_bands — unique difference
    pattern per class) with fixed per-tone amplitudes (1.0/0.62/0.38)
    under a class-seeded 8-step amplitude ENVELOPE (a permutation of
    well-separated levels 0.30..1.00) — the time structure the warp
    transform scrambles and the aligned SNR verify keys on.  Base rows
    of the same class are BYTE-IDENTICAL (envelope and phases are
    class-functions), so base-vs-base dups land at the exact tier.

    Copy rows (id = src + 1_000_000, planted at src < 200, src % 4 == 0)
    apply transform cascade_transform(src):
      0 exact — bit-identical payload (no noise);
      1 gain  — samples x 0.5, re-quantized, + seeded ~43 dB noise;
      2 warp  — segment 1 duplicated, segment 6 dropped (length
                preserved; envelope sequence permuted so no scalar gain
                aligns it), + noise;
      3 pitch — every tone shifted cascade_pitch_shift(src) semitones,
                + noise.
    Noise on non-exact copies keeps same-class copies byte-distinct (two
    noiseless gain copies of one class would be identical and collapse
    at the exact tier with the wrong keeper).  1_000_000 % n_classes
    must be 0 so copy and source share a class (congruence oracle)."""
    if 1_000_000 % n_classes != 0:
        raise ValueError("n_classes must divide 1_000_000 (congruence oracle)")
    if n_classes > 210:
        raise ValueError("pitch_class_bands is injective only below 210 classes")
    amps = (1.0, 0.62, 0.38)
    levels = 0.30 + 0.10 * np.arange(n_segs)

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        t = np.arange(sr_hz) / float(sr_hz)
        seg_len = sr_hz // n_segs
        for d in doc_id:
            d = int(d)
            src = d - 1_000_000 if d >= 1_000_000 else d
            trans = cascade_transform(src) if d >= 1_000_000 else -1
            cls = src % n_classes
            bands = pitch_class_bands(cls)
            k = cascade_pitch_shift(src) if trans == 3 else 0
            env_seed = int.from_bytes(
                hashlib.blake2b(
                    f"casc-env|{cls}".encode(), digest_size=4
                ).digest(),
                "little",
            )
            env_levels = np.random.RandomState(env_seed).permutation(levels)
            envelope = np.repeat(env_levels, seg_len)[:sr_hz]
            x = np.zeros(sr_hz)
            for amp, band in zip(amps, bands):
                freq = round(f_lo * 2.0 ** ((band + 0.5 + k) / 12.0))
                x = x + amp * np.sin(2.0 * np.pi * freq * t)
            x = x / 2.2 * envelope
            if trans == 2:
                segs = [x[i * seg_len : (i + 1) * seg_len] for i in range(n_segs)]
                x = np.concatenate(
                    [segs[0], segs[1], segs[1], segs[2], segs[3], segs[4],
                     segs[5], segs[7]]
                )
            if trans == 1:
                x = x * 0.5
            if trans in (1, 2, 3):
                nseed = int.from_bytes(
                    hashlib.blake2b(
                        f"casc-noise|{d}".encode(), digest_size=4
                    ).digest(),
                    "little",
                )
                x = x + noise_amp * np.random.RandomState(nseed).randn(len(x))
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf
