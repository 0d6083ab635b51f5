"""Deterministic synthetic `clips` table (FIXTURES.md §1).

Schema (authoritative shape from BASELINE.json input_hint):
    clip_id STRING, bytes BINARY, sr_hz INT, dur_ms INT, codec STRING,
    transcript STRING

Generation is fully seeded (no wall-clock entropy) and **distributed**: the
driver materializes only a seed range; every clip row is synthesized inside
an Arrow-batched ``mapInPandas`` from its integer index, so the generator
itself scales to any row count without driver memory.

Planted ground truth: clips are grouped into clusters; cluster members are
mutations of a shared base transcript (character edits, adjacent
transpositions, word reorderings, case flips, appended boilerplate, exact
copies — the reference-visible mutation classes from FIXTURES.md §1), and a
companion ``truth`` DataFrame (clip_id, true_cluster_id) feeds the recall
harness.  Audio bytes are 16-bit little-endian PCM of a deterministic
two-sine waveform keyed by the cluster; near-dup members add low-amplitude
jitter that keeps SNR >= 30 dB vs the base waveform.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BASE_VOCAB = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs how vexingly daft zebras audio clip speech transcript "
    "signal noise sample rate channel frame buffer codec stream segment "
    "window overlap spectrum filter phase amplitude frequency pitch tone"
).split()

# Deterministic pseudo-word expansion to ~2000 types.  A 40-word vocabulary
# gives UNRELATED transcripts trigram set-Jaccard ~0.34 (p99 0.52) — every
# pair of documents looks like a near-duplicate, which no real speech/web
# corpus does, and the LSH noise mass grows quadratically.  At ~2000 types
# cross-pair similarity collapses to realistic noise while planted
# mutations keep true dup pairs at J ~0.8.
_SYLLABLES = [
    "ba", "do", "ki", "lu", "mo", "ne", "pa", "ri",
    "su", "ta", "ve", "zo", "cha", "el", "fi", "gu",
]
# i -> (i * odd) mod 4096 is a bijection, so all 1960 three-syllable words
# are distinct (16^3 = 4096 possible)
_VOCAB = _BASE_VOCAB + [
    _SYLLABLES[(x >> 8) & 15] + _SYLLABLES[(x >> 4) & 15] + _SYLLABLES[x & 15]
    for i in range(1960)
    for x in [(i * 2654435761) % 4096]
]

_BOILERPLATE = "this recording is provided for research purposes only"


@dataclass(frozen=True)
class ClipsSpec:
    n_clips: int = 1000
    seed: int = 42
    dup_fraction: float = 0.5  # fraction of rows that belong to dup clusters
    max_cluster_size: int = 8
    sr_hz: int = 16000
    dur_ms: int = 250  # keep PCM payloads small but real


def _rng_for(seed: int, *keys: int) -> np.random.RandomState:
    h = hashlib.blake2b(
        b"|".join(str(k).encode() for k in (seed, *keys)), digest_size=4
    ).digest()
    return np.random.RandomState(int.from_bytes(h, "little"))


def _base_transcript(spec: ClipsSpec, cluster: int) -> str:
    rng = _rng_for(spec.seed, 1, cluster)
    n_words = int(rng.randint(20, 60))
    return " ".join(_VOCAB[i] for i in rng.randint(0, len(_VOCAB), n_words))


def _mutate(text: str, rng: np.random.RandomState, kind: int) -> str:
    """Reference-visible mutation classes (FIXTURES.md §1)."""
    if kind == 0:  # exact copy
        return text
    if kind == 1:  # character substitutions (Levenshtein-reachable)
        chars = list(text)
        for _ in range(max(1, len(chars) // 60)):
            i = int(rng.randint(0, len(chars)))
            chars[i] = chr(ord("a") + int(rng.randint(0, 26)))
        return "".join(chars)
    if kind == 2:  # adjacent transpositions (Damerau)
        chars = list(text)
        for _ in range(max(1, len(chars) // 80)):
            i = int(rng.randint(0, len(chars) - 1))
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
        return "".join(chars)
    if kind == 3:  # word reordering (Jaccard/cosine-invariant-ish)
        ws = text.split()
        i = int(rng.randint(0, max(len(ws) - 3, 1)))
        ws[i], ws[i + 2] = ws[i + 2], ws[i]
        return " ".join(ws)
    if kind == 4:  # case flips (case-insensitivity path)
        return "".join(
            c.upper() if rng.rand() < 0.15 and c.isalpha() else c for c in text
        )
    # kind 5: appended boilerplate (containment — substring pass)
    return text + " " + _BOILERPLATE


def _pcm_wave(spec: ClipsSpec, cluster: int, jitter_rng=None) -> np.ndarray:
    """Deterministic two-sine waveform per cluster; optional jitter keeps
    SNR >= 30 dB (amplitude 1/100 of signal -> SNR ~ 34 dB)."""
    rng = _rng_for(spec.seed, 2, cluster)
    n = spec.sr_hz * spec.dur_ms // 1000
    t = np.arange(n, dtype=np.float64) / spec.sr_hz
    f1 = 200.0 + 1800.0 * rng.rand()
    f2 = 200.0 + 1800.0 * rng.rand()
    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    if jitter_rng is not None:
        x = x + 0.008 * jitter_rng.randn(n)
    return np.clip(x * 32767.0, -32768, 32767).astype("<i2")


def _plan(spec: ClipsSpec) -> tuple[np.ndarray, np.ndarray]:
    """index -> (cluster_id, member_rank).  Deterministic partition of
    [0, n) into clusters of size 1 (singletons) and 2..max (dups)."""
    rng = _rng_for(spec.seed, 0)
    cluster_ids = np.empty(spec.n_clips, dtype=np.int64)
    ranks = np.empty(spec.n_clips, dtype=np.int64)
    i = 0
    cluster = 0
    while i < spec.n_clips:
        if rng.rand() < spec.dup_fraction:
            size = int(rng.randint(2, spec.max_cluster_size + 1))
        else:
            size = 1
        size = min(size, spec.n_clips - i)
        cluster_ids[i : i + size] = cluster
        ranks[i : i + size] = np.arange(size)
        i += size
        cluster += 1
    return cluster_ids, ranks


def generate_clips(spark: SparkSession, spec: ClipsSpec) -> tuple[DataFrame, DataFrame]:
    """Returns (clips, truth).  clips has the input_hint schema; truth is
    (clip_id, true_cluster_id) for clips whose cluster has >= 2 members."""
    cluster_ids, ranks = _plan(spec)
    # Broadcast the tiny plan arrays; synthesize rows per-partition.
    sc = spark.sparkContext
    plan_b = sc.broadcast((cluster_ids, ranks))
    spec_b = sc.broadcast(spec)

    idx_df = spark.range(spec.n_clips).repartition(
        max(spark.sparkContext.defaultParallelism, 8)
    )

    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, true_cluster_id string"
    )

    def gen(batches):
        spec_l: ClipsSpec = spec_b.value
        clusters_l, ranks_l = plan_b.value
        base_cache: dict[int, str] = {}
        for pdf in batches:
            rows = []
            for idx in pdf["id"]:
                idx = int(idx)
                cluster = int(clusters_l[idx])
                rank = int(ranks_l[idx])
                if cluster not in base_cache:
                    base_cache[cluster] = _base_transcript(spec_l, cluster)
                base = base_cache[cluster]
                rng = _rng_for(spec_l.seed, 3, cluster, rank)
                if rank == 0:
                    transcript = base
                    pcm = _pcm_wave(spec_l, cluster)
                else:
                    transcript = _mutate(base, rng, kind=int(rng.randint(0, 6)))
                    pcm = _pcm_wave(spec_l, cluster, jitter_rng=rng)
                rows.append(
                    {
                        "clip_id": f"clip_{idx:012d}",
                        "bytes": pcm.tobytes(),
                        "sr_hz": spec_l.sr_hz,
                        "dur_ms": spec_l.dur_ms,
                        "codec": "pcm_s16le",
                        "transcript": transcript,
                        "true_cluster_id": f"cluster_{cluster:09d}",
                    }
                )
            yield pd.DataFrame(rows)

    full = idx_df.mapInPandas(gen, schema=schema)
    clips = full.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    counts = full.groupBy("true_cluster_id").agg(F.count(F.lit(1)).alias("n"))
    truth = (
        full.join(F.broadcast(counts.filter(F.col("n") >= 2)), "true_cluster_id")
        .select("clip_id", "true_cluster_id")
    )
    return clips, truth
