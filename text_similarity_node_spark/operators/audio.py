"""Audio column operators (multimodal payload handling).

The `bytes` column is an opaque BINARY payload with typed metadata
(sr_hz, dur_ms, codec) — the engine treats it exactly as a training-data
pipeline must: never shuffled through the similarity stages (column pruning
keeps it at rest), decoded only at the edges.

Real here (no external audio libs needed):
* ``decode_pcm_s16le`` — little-endian 16-bit PCM -> float64 numpy frames;
* ``snr_db`` — per-row SNR of a clip against a reference clip (the >= 30 dB
  fidelity invariant from BASELINE.json input_hint);
* ``frame_sample`` / ``rms_energy`` — frame-level feature extraction;
* ``resample_pcm`` / ``resample_pcm_udf`` — rational L/M sample-rate
  conversion (zero-stuff -> windowed-sinc FIR low-pass -> decimate, the
  textbook polyphase-equivalent construction), used to canonicalize a
  mixed-rate corpus before fingerprinting (q52).

Stubbed (container has no codecs; Spark-side plumbing — schema, batch
shape, partitioning — is real and tested):
* compressed-codec decode (``decode_clip`` raises NotImplementedError for
  codecs other than pcm_s16le).
"""

from __future__ import annotations

from math import gcd

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_pcm_s16le(payload: bytes) -> np.ndarray:
    """PCM s16le -> float64 in [-1, 1)."""
    return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0


def decode_clip(payload: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        return decode_pcm_s16le(payload)
    # STUB: compressed codecs need an audio library not present in this
    # container; the pipeline treats them as opaque and defers decode.
    raise NotImplementedError(f"codec {codec!r} decode not available in this build")


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against reference `ref` in dB."""
    n = min(len(ref), len(test))
    if n == 0:
        return float("-inf")
    ref, test = ref[:n], test[:n]
    noise = test - ref
    p_sig = float(np.mean(ref**2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


@F.pandas_udf(T.DoubleType())
def rms_energy_udf(payload: pd.Series) -> pd.Series:
    """Arrow-batched RMS energy of a pcm_s16le payload."""
    out = np.empty(len(payload), dtype=np.float64)
    for i, b in enumerate(payload):
        if b is None or len(b) == 0:
            out[i] = np.nan
        else:
            x = decode_pcm_s16le(b)
            out[i] = float(np.sqrt(np.mean(x**2)))
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def zcr_count_udf(payload: pd.Series) -> pd.Series:
    """Arrow-batched zero-crossing count of a pcm_s16le payload: drop the
    exactly-zero samples, then count adjacent pairs with negative product.
    Dropping zeros first is the standard robust ZCR — a crossing that
    passes THROUGH a zero sample still counts once — and it keeps the
    rule SQL-restatable over the identical integers (filter v <> 0, lag,
    product < 0): no sign(0) convention for engines to disagree on."""
    out = np.empty(len(payload), dtype=np.int64)
    for i, b in enumerate(payload):
        if b is None or len(b) < 4:
            out[i] = 0
        else:
            x = np.frombuffer(b, dtype="<i2").astype(np.int64)
            x = x[x != 0]
            out[i] = int(np.count_nonzero(x[:-1] * x[1:] < 0)) if len(x) > 1 else 0
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def peak_abs_udf(payload: pd.Series) -> pd.Series:
    """Arrow-batched peak |sample| (int16 domain) of a pcm_s16le payload."""
    out = np.empty(len(payload), dtype=np.int64)
    for i, b in enumerate(payload):
        if b is None or len(b) < 2:
            out[i] = 0
        else:
            out[i] = int(np.max(np.abs(np.frombuffer(b, dtype="<i2").astype(np.int64))))
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def pairwise_snr_udf(ref_bytes: pd.Series, test_bytes: pd.Series) -> pd.Series:
    """SNR (dB) of test vs ref payloads — the fidelity verifier."""
    out = np.empty(len(ref_bytes), dtype=np.float64)
    for i, (a, b) in enumerate(zip(ref_bytes, test_bytes)):
        if a is None or b is None:
            out[i] = np.nan
        else:
            out[i] = snr_db(decode_pcm_s16le(a), decode_pcm_s16le(b))
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def pairwise_snr_bestgain_udf(ref_bytes: pd.Series, test_bytes: pd.Series) -> pd.Series:
    """SNR (dB) of test vs ref after fitting the OPTIMAL scalar gain
    g* = <ref, test> / <test, test> — the gain-invariant fidelity
    verifier: a volume-rescaled re-encode of the same recording reads
    near-lossless here (residual = rounding/noise only), while a
    time-warped or unrelated waveform stays low because no single gain
    can align mismatched envelopes.  Same alignment contract as
    ``pairwise_snr_udf`` (leading-sample comparison, truncated to the
    shorter payload)."""
    out = np.empty(len(ref_bytes), dtype=np.float64)
    for i, (a, b) in enumerate(zip(ref_bytes, test_bytes)):
        if a is None or b is None:
            out[i] = np.nan
            continue
        x = decode_pcm_s16le(a)
        y = decode_pcm_s16le(b)
        n = min(len(x), len(y))
        if n == 0:
            out[i] = float("-inf")
            continue
        x, y = x[:n], y[:n]
        denom = float(np.dot(y, y))
        g = float(np.dot(x, y)) / denom if denom > 0.0 else 0.0
        out[i] = snr_db(x, g * y)
    return pd.Series(out)


def frame_sample_udf(frame_ms: int = 25, hop_ms: int = 10):
    """payload, sr_hz -> array of frame RMS values (feature extraction
    plumbing: schema array<double>, deterministic, Arrow-batched)."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def udf(payload: pd.Series, sr_hz: pd.Series) -> pd.Series:
        out = []
        for b, sr in zip(payload, sr_hz):
            if b is None or sr is None or len(b) == 0:
                out.append([])
                continue
            x = decode_pcm_s16le(b)
            flen = int(sr) * frame_ms // 1000
            hop = int(sr) * hop_ms // 1000
            if flen == 0 or hop == 0 or len(x) < flen:
                out.append([])
                continue
            starts = np.arange(0, len(x) - flen + 1, hop)
            frames = np.stack([x[s : s + flen] for s in starts])
            out.append(np.sqrt((frames**2).mean(axis=1)).tolist())
        return pd.Series(out)

    return udf


@F.pandas_udf(T.BinaryType())
def synth_sine_pcm_udf(doc_id: pd.Series) -> pd.Series:
    """Deterministic pcm_s16le payload per id: 800-sample 16 kHz sine at
    100 + id % 400 Hz, amplitude 16384 — analytic, so SQL oracles can
    recompute the exact waveform (used by the driver-contract audio query
    and fixtures)."""
    out = []
    for d in doc_id:
        freq = 100.0 + (int(d) % 400)
        t = np.arange(800) / 16000.0
        x = np.sin(2.0 * np.pi * freq * t)
        out.append((x * 16384.0).astype("<i2").tobytes())
    return pd.Series(out)


def synth_sine1s_pcm_udf(sr_hz: int = 16000, amp: float = 0.5,
                         jitter_amp: float = 0.008):
    """Deterministic 1-second pcm_s16le sine per id: frequency
    100 + id % 400 Hz.  Ids >= 1_000_000 additionally carry seeded
    Gaussian jitter (amplitude ratio ~ SNR 34 dB) — the planted "same
    recording, noisy copy" rows for the audio-fingerprint dedup query.
    1_000_000 % 400 == 0, so a copy shares its source's frequency and the
    id % 400 congruence IS the ground-truth pairing key (SQL-expressible:
    the q32 oracle)."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        t = np.arange(sr_hz) / float(sr_hz)
        for d in doc_id:
            d = int(d)
            freq = 100.0 + (d % 400)
            x = amp * np.sin(2.0 * np.pi * freq * t)
            if d >= 1_000_000:
                x = x + jitter_amp * np.random.RandomState(d % 2**31).randn(len(t))
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


def synth_sine_vardur_pcm_udf(sr_hz: int = 16000, amp: float = 0.5,
                              jitter_amp: float = 0.008):
    """Variable-DURATION variant of :func:`synth_sine1s_pcm_udf`: the clip
    for id ``d`` is ``12000 + (d % 400) * 16`` samples of a
    ``100 + d % 400`` Hz sine (0.75-1.15 s at 16 kHz).  Duration is keyed
    by the same mod-400 congruence as frequency, so a noisy copy
    (id >= 1_000_000, seeded jitter ~ SNR 34 dB) has EXACTLY its source's
    length — the "same recording" contract holds — and the sample count is
    divisible by 16, so duration in ms is the exact integer
    ``len(bytes) / 32``.  Used by the duration-weighted dedup-savings
    query, where audio-hours removed must be derived from the payload
    itself, not trusted metadata."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            k = d % 400
            freq = 100.0 + k
            n = 12000 + k * 16
            t = np.arange(n) / float(sr_hz)
            x = amp * np.sin(2.0 * np.pi * freq * t)
            if d >= 1_000_000:
                x = x + jitter_amp * np.random.RandomState(d % 2**31).randn(n)
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


#: int16 sample magnitude treated as "clipped" (symmetric full scale).
CLIP_LEVEL = 32767
#: |sample| below this (~1% of full scale) counts as silence.
SILENCE_LEVEL = 328

QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_clipped", T.LongType()),
        T.StructField("n_silent", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


@F.pandas_udf(QUALITY_SCHEMA)
def audio_quality_udf(payload: pd.Series) -> pd.DataFrame:
    """Integer-domain quality metrics of a pcm_s16le payload: sample count,
    clipped-sample count (|s| >= CLIP_LEVEL), silent-sample count
    (|s| < SILENCE_LEVEL), and peak |s|.  Stays in int64 end-to-end so the
    metrics are oracle-hashable without float channels; the keep/drop
    policy (ratios, thresholds) lives in plain column expressions on top.
    Scale: one Arrow batch pass, payload consumed where produced."""
    rows = np.zeros((len(payload), 4), dtype=np.int64)
    for i, b in enumerate(payload):
        if b is None or len(b) == 0:
            continue
        s = np.abs(np.frombuffer(b, dtype="<i2").astype(np.int64))
        rows[i] = (
            len(s),
            int((s >= CLIP_LEVEL).sum()),
            int((s < SILENCE_LEVEL).sum()),
            int(s.max()),
        )
    return pd.DataFrame(
        rows, columns=["n_samples", "n_clipped", "n_silent", "peak"]
    )


@F.pandas_udf(T.BinaryType())
def synth_quality_pcm_udf(doc_id: pd.Series) -> pd.Series:
    """Deterministic pcm_s16le payload per id with PLANTED QUALITY DEFECTS
    (the q48 fixture): 800-sample 16 kHz sine at 100 + id % 400 Hz.
    ids % 7 == 3 are over-driven (amplitude 39321 -> ~37% of samples clamp
    at +/-32767: hard clipping); ids % 11 == 4 have their first 400 samples
    gated to zero (half-silent).  Everything is trunc/clamp integer
    arithmetic over an analytic waveform, so a SQL oracle reproduces the
    exact samples; the phase term mirrors the oracle's left-to-right
    association (2*pi*f) * i / 16000."""
    out = []
    i = np.arange(800, dtype=np.float64)
    for d in doc_id:
        d = int(d)
        freq = 100.0 + (d % 400)
        amp = 39321.0 if d % 7 == 3 else 16384.0
        x = np.clip(
            np.trunc(amp * np.sin((2.0 * np.pi * freq) * i / 16000.0)),
            -32767.0,
            32767.0,
        )
        if d % 11 == 4:
            x[:400] = 0.0
        out.append(x.astype("<i2").tobytes())
    return pd.Series(out)


def synth_melody_pcm_udf(
    sr_hz: int = 16000,
    seg_len: int = 4096,
    n_classes: int = 400,
    tone_step: float = 3.0,
    seg_step: float = 1021.0,
    amp: float = 0.4,
    shift: int = 2048,
):
    """Deterministic NON-STATIONARY pcm_s16le clip per id (the q51
    fixture): a 4-tone cycling melody keyed by id % n_classes — segment s
    plays 100 + tone_step*class + seg_step*(s % 4) Hz.  Ids >= 1_000_000
    carry the SAME melody TIME-SHIFTED by ``shift`` samples (one landmark
    hop): both variants are windows of one longer deterministic waveform,
    i.e. a true time shift, not a resynthesis.

    Stationary fixtures (q32's constant sines) cannot distinguish a
    shift-invariant fingerprint from a shift-fragile one — every frame
    looks alike.  Here frames differ along time, so matching hashes exist
    ONLY because the constellation scheme's (f1, f2, dt) landmarks are
    anchored relatively, not absolutely.

    seg_step = 1021 (prime, not a multiple of tone_step=3) guarantees no
    class's tone set intersects another's — in particular no class's
    SHIFTED melody equals another class's base melody, which a round
    seg_step like 900 = 3*300 would create (class c shifted == class
    c+300 base: a planted false-positive)."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        total = sr_hz + shift
        i = np.arange(total, dtype=np.float64)
        seg = (np.arange(total) // seg_len) % 4
        for d in doc_id:
            d = int(d)
            freq = 100.0 + tone_step * (d % n_classes) + seg_step * seg
            x = amp * np.sin(2.0 * np.pi * freq * i / sr_hz)
            lo = shift if d >= 1_000_000 else 0
            clip = x[lo : lo + sr_hz]
            out.append(
                np.clip(clip * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


def synth_track_pcm_udf(
    sr_hz: int = 16000,
    seg_len: int = 8192,
    n_segments: int = 8,
    snip_segments: int = 3,
    base_hz: float = 200.0,
    amp: float = 0.4,
):
    """Deterministic multi-segment "track" pcm_s16le per id (the q96
    retrieval fixture): segment s of track c plays base_hz +
    (c*n_segments + s) Hz — a GLOBALLY UNIQUE frequency per (track,
    segment), so distinct tracks share no spectral content at all and
    any cross-track landmark match is a bug, not a collision (which is
    what makes the retrieval operator's precision exactly auditable).
    Ids >= 1_000_000 are SNIPPETS: the byte-exact slice of parent
    c = id - 1_000_000 covering ``snip_segments`` segments starting at
    segment offset c % (n_segments - snip_segments + 1) — a true
    substring of the parent waveform at a content-determined position
    (computed by slicing the full synthesized track, so snippet samples
    are bit-identical to the parent span).  Caller must keep
    base_hz + c*n_segments + n_segments below Nyquist (c < 974 with the
    defaults at 16 kHz)."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        n_off = n_segments - snip_segments + 1
        total = seg_len * n_segments
        i = np.arange(total, dtype=np.float64)
        seg = np.arange(total) // seg_len
        for d in doc_id:
            d = int(d)
            c = d - 1_000_000 if d >= 1_000_000 else d
            freq = base_hz + (c * n_segments + seg)
            x = amp * np.sin(2.0 * np.pi * freq * i / sr_hz)
            if d >= 1_000_000:
                o = c % n_off
                x = x[o * seg_len : (o + snip_segments) * seg_len]
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


def _design_lowpass(fc: float, taps: int) -> np.ndarray:
    """Linear-phase windowed-sinc FIR low-pass; fc in cycles/sample, odd
    taps (symmetric kernel => np.convolve(mode='same') is group-delay
    compensated).  Hamming window; unity DC gain."""
    n = np.arange(taps) - (taps - 1) / 2
    h = 2.0 * fc * np.sinc(2.0 * fc * n)
    h *= np.hamming(taps)
    return h / h.sum()


def resample_pcm(
    x: np.ndarray, sr_from: int, sr_to: int, taps: int = 127
) -> np.ndarray:
    """REAL rational-ratio resampler (numpy only): zero-stuff by L, FIR
    low-pass at min Nyquist (gain L), decimate by M, with L/M =
    sr_to/sr_from in lowest terms — the textbook multirate construction
    (Crochiere & Rabiner).  Output is float64, time-aligned with the
    input (odd symmetric kernel + mode='same' cancels group delay), so a
    down->up round trip is sample-aligned with the original — the
    property the q52 fingerprint audit and the SNR>=30dB fidelity tests
    rely on.  Content above the lower Nyquist is attenuated by the
    filter, not aliased (transition band ~3.3/taps of the upsampled
    rate)."""
    if sr_from <= 0 or sr_to <= 0:
        raise ValueError("sample rates must be positive")
    if taps % 2 != 1:
        raise ValueError("taps must be odd (linear-phase symmetric kernel)")
    x = np.asarray(x, dtype=np.float64)
    if sr_from == sr_to or len(x) == 0:
        return x.copy()
    g = gcd(sr_from, sr_to)
    up_f, down_f = sr_to // g, sr_from // g
    stuffed = np.zeros(len(x) * up_f, dtype=np.float64)
    stuffed[::up_f] = x
    fc = 0.5 / max(up_f, down_f)  # cycles/sample at the upsampled rate
    h = _design_lowpass(fc, taps) * up_f  # gain L restores amplitude
    return np.convolve(stuffed, h, mode="same")[::down_f]


def resample_pcm_udf(sr_to: int, taps: int = 127):
    """(bytes pcm_s16le, sr_hz) -> bytes pcm_s16le at sr_to.  Arrow-
    batched canonicalization edge for mixed-rate corpora: rows already at
    sr_to pass through untouched (bit-exact), others go through
    resample_pcm with int16 re-quantization (overshoot clipped)."""

    @F.pandas_udf(T.BinaryType())
    def udf(payload: pd.Series, sr_hz: pd.Series) -> pd.Series:
        out = []
        for b, sr in zip(payload, sr_hz):
            if b is None or sr is None:
                out.append(None)
                continue
            sr = int(sr)
            if sr == sr_to:
                out.append(b)
                continue
            x = np.frombuffer(b, dtype="<i2").astype(np.float64)
            y = resample_pcm(x, sr, sr_to, taps=taps)
            out.append(
                np.clip(np.round(y), -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


# ---------------------------------------------------------------------------
# voice-activity detection (frame-energy VAD) — the trim/keep stage a speech
# training-data pipeline runs before transcription or fingerprinting
# ---------------------------------------------------------------------------

VAD_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_active", T.LongType()),
        T.StructField("first_active", T.LongType()),
        T.StructField("last_active", T.LongType()),
    ]
)


def vad_udf(frame_len: int = 160, silence_level: int = SILENCE_LEVEL):
    """Energy VAD over pcm_s16le: non-overlapping frames of ``frame_len``
    samples; a frame is ACTIVE iff its summed |sample| is at least
    ``frame_len * silence_level`` (i.e. mean magnitude clears the q48
    silence floor).  Emits frame counts plus the first/last active frame
    index (-1 when the clip is all-silent) — enough for a lead/tail trim
    and a speech-ratio keep policy downstream, all in int64 channels so a
    SQL oracle can reproduce the numbers bit-for-bit.
    Scale: one Arrow pass, payload consumed where produced (map-only);
    the per-clip output is 4 ints regardless of clip length."""
    thresh = frame_len * silence_level

    @F.pandas_udf(VAD_SCHEMA)
    def udf(payload: pd.Series) -> pd.DataFrame:
        rows = np.zeros((len(payload), 4), dtype=np.int64)
        for idx, b in enumerate(payload):
            if b is None or len(b) < 2 * frame_len:
                rows[idx] = (0, 0, -1, -1)
                continue
            s = np.abs(np.frombuffer(b, dtype="<i2").astype(np.int64))
            nf = len(s) // frame_len
            energy = s[: nf * frame_len].reshape(nf, frame_len).sum(axis=1)
            act = np.nonzero(energy >= thresh)[0]
            rows[idx] = (
                nf,
                len(act),
                int(act[0]) if len(act) else -1,
                int(act[-1]) if len(act) else -1,
            )
        return pd.DataFrame(
            rows, columns=["n_frames", "n_active", "first_active", "last_active"]
        )

    return udf


@F.pandas_udf(T.BinaryType())
def synth_vad_pcm_udf(doc_id: pd.Series) -> pd.Series:
    """Deterministic pcm_s16le payload with PLANTED SILENCE STRUCTURE (the
    q53 fixture): 1600-sample 16 kHz sine at 100 + id % 200 Hz, amplitude
    16384, with the first ``id % 4`` and the last ``id % 3`` 160-sample
    frames gated to zero (leading/trailing silence).  Trunc/analytic
    integer arithmetic throughout, so a SQL oracle reproduces the exact
    samples; phase term mirrors the oracle's left-to-right association
    (2*pi*f) * i / 16000 (the q48 convention)."""
    out = []
    i = np.arange(1600, dtype=np.float64)
    for d in doc_id:
        d = int(d)
        freq = 100.0 + (d % 200)
        x = np.trunc(16384.0 * np.sin((2.0 * np.pi * freq) * i / 16000.0))
        lead, tail = d % 4, d % 3
        if lead:
            x[: 160 * lead] = 0.0
        if tail:
            x[1600 - 160 * tail :] = 0.0
        out.append(x.astype("<i2").tobytes())
    return pd.Series(out)


# ---------------------------------------------------------------------------
# stereo handling — interleaved-channel decode and downmix-to-mono, the
# canonicalization step before any mono fingerprint/quality pass
# ---------------------------------------------------------------------------

DOWNMIX_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


@F.pandas_udf(DOWNMIX_SCHEMA)
def downmix_stats_udf(payload: pd.Series) -> pd.DataFrame:
    """Decode interleaved stereo pcm_s16le (LRLR...), downmix to mono as
    trunc((L+R)/2) (toward-zero, the float-exact halves convention a SQL
    oracle can mirror), and emit integer evidence the mix is right
    sample-for-sample: frame count, peak |m|, sum |m|, and a
    position-weighted checksum sum((i+1)*m_i).  The checksum pins every
    sample's value AND position without shipping the waveform anywhere.
    Scale: map-only Arrow pass; 4 ints per clip out."""
    rows = np.zeros((len(payload), 4), dtype=np.int64)
    for idx, b in enumerate(payload):
        if b is None or len(b) < 4:
            continue
        x = np.frombuffer(b, dtype="<i2").astype(np.int64)
        n = len(x) // 2
        left, right = x[0 : 2 * n : 2], x[1 : 2 * n : 2]
        m = np.trunc((left + right) / 2.0).astype(np.int64)
        w = np.arange(1, n + 1, dtype=np.int64)
        rows[idx] = (
            n,
            int(np.abs(m).max()),
            int(np.abs(m).sum()),
            int((w * m).sum()),
        )
    return pd.DataFrame(
        rows, columns=["n_frames", "peak", "sum_abs", "checksum"]
    )


@F.pandas_udf(T.BinaryType())
def synth_stereo_pcm_udf(doc_id: pd.Series) -> pd.Series:
    """Deterministic interleaved-stereo pcm_s16le payload (the q55
    fixture): 400 frames, left = trunc(12000*sin(2*pi*(100 + id % 300) *
    i / 16000)), right = trunc(12000*sin(2*pi*(150 + id % 250) * i /
    16000)), interleaved LRLR.  Analytic trunc arithmetic so a SQL
    oracle recomputes both channels exactly."""
    out = []
    i = np.arange(400, dtype=np.float64)
    for d in doc_id:
        d = int(d)
        left = np.trunc(
            12000.0 * np.sin((2.0 * np.pi * (100.0 + d % 300)) * i / 16000.0)
        )
        right = np.trunc(
            12000.0 * np.sin((2.0 * np.pi * (150.0 + d % 250)) * i / 16000.0)
        )
        inter = np.empty(800, dtype=np.float64)
        inter[0::2] = left
        inter[1::2] = right
        out.append(inter.astype("<i2").tobytes())
    return pd.Series(out)


# ---------------------------------------------------------------------------
# loudness normalization — gain staging to a target peak, the level
# canonicalization before energy-threshold ops (VAD, silence gates) so one
# threshold works across a mixed-level corpus
# ---------------------------------------------------------------------------

NORMALIZE_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak_in", T.LongType()),
        T.StructField("gain_micro", T.LongType()),
        T.StructField("peak_out", T.LongType()),
        T.StructField("checksum_out", T.LongType()),
    ]
)


def normalize_gain_udf(target_peak: int = 30000, max_gain_micro: int = 4_000_000):
    """Peak normalization of pcm_s16le in PURE INTEGER arithmetic: per-clip
    gain_micro = min(target_peak * 1e6 // peak, max_gain_micro) (the boost
    cap keeps near-silent clips from amplifying noise to full scale), then
    every sample is scaled as trunc-toward-zero (s * gain_micro) / 1e6 —
    the same floor-on-magnitude both Spark's `div` and DuckDB's `//`
    compute, so a SQL oracle reproduces the normalized waveform exactly.
    Evidence channels: input peak, applied gain, output peak, and the
    position-weighted checksum sum((i+1) * m_i) pinning every output
    sample's value and position.
    Scale: map-only Arrow pass, 5 ints per clip out."""

    @F.pandas_udf(NORMALIZE_SCHEMA)
    def udf(payload: pd.Series) -> pd.DataFrame:
        rows = np.zeros((len(payload), 5), dtype=np.int64)
        for idx, b in enumerate(payload):
            if b is None or len(b) < 2:
                continue
            s = np.frombuffer(b, dtype="<i2").astype(np.int64)
            peak = int(np.abs(s).max())
            if peak == 0:
                rows[idx] = (len(s), 0, 0, 0, 0)
                continue
            gain = min(target_peak * 1_000_000 // peak, max_gain_micro)
            p = s * gain
            # trunc-toward-zero division (numpy // floors, so divide the
            # magnitude and reapply the sign — matches `div` / `//`)
            m = (np.abs(p) // 1_000_000) * np.sign(p)
            w = np.arange(1, len(s) + 1, dtype=np.int64)
            rows[idx] = (
                len(s),
                peak,
                gain,
                int(np.abs(m).max()),
                int((w * m).sum()),
            )
        return pd.DataFrame(
            rows,
            columns=[
                "n_samples", "peak_in", "gain_micro", "peak_out", "checksum_out",
            ],
        )

    return udf


def gain_pcm_udf(gain: float):
    """Scale pcm_s16le by ``gain`` (round-half-away, clipped to int16) —
    the re-encode/volume-normalize transformation the gain-robustness
    audit (q71) applies.  Deterministic and engine-free: pure numpy on
    the decoded samples, re-encoded little-endian."""

    @F.pandas_udf(T.BinaryType())
    def udf(payload: pd.Series) -> pd.Series:
        out = []
        for p in payload:
            if p is None:
                out.append(None)
                continue
            x = np.frombuffer(p, dtype="<i2").astype(np.float64) * gain
            x = np.clip(np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)),
                        -32768, 32767)
            out.append(x.astype("<i2").tobytes())
        return pd.Series(out)

    return udf


def synth_stretch_pcm_udf(
    sr_hz: int = 16000,
    n_bands: int = 32,
    n_classes: int = 250,
    f_lo: float = 100.0,
    f_hi: float = 4000.0,
    amp: float = 0.35,
    max_stretch_pct: int = 3,
    noise_amp: float = 0.003,
):
    """Deterministic two-tone pcm_s16le clip per id (the q101 fixture):
    class ``c = id % n_classes`` plays the geometric CENTERS of log-bands
    ``(c % 16, 16 + c // 16)`` of an ``n_bands``-point log-spaced grid on
    [f_lo, f_hi] — distinct classes share at most one band, so their
    band-energy profiles have cosine <= ~0.5 while same-class profiles
    sit at ~1.0.

    Ids >= 1_000_000 are the same class's recording played back at a
    SPEED/PITCH STRETCH of 1 + k% (k in [-max_stretch_pct,
    +max_stretch_pct] keyed by id), with seeded Gaussian noise
    (~41 dB SNR at the defaults) and a deterministic phase offset — the
    re-encode class that breaks landmark (f1, f2, dt) hashes (every
    frequency AND every time delta moves by k%) but stays inside a
    log-band of half-width ln(f_hi/f_lo)/(2*n_bands) (~5.9% at the
    defaults, vs 3% max stretch).  n_classes=250 divides 1_000_000, so
    ``id % n_classes`` is the class for copies too."""

    ratio = (f_hi / f_lo) ** (1.0 / n_bands)

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        i = np.arange(sr_hz, dtype=np.float64)
        for d in doc_id:
            d = int(d)
            c = d % n_classes
            b1, b2 = c % 16, 16 + c // 16
            f1 = f_lo * ratio ** (b1 + 0.5)
            f2 = f_lo * ratio ** (b2 + 0.5)
            if d >= 1_000_000:
                s = 1.0 + ((d % (2 * max_stretch_pct + 1)) - max_stretch_pct) / 100.0
                f1, f2 = f1 * s, f2 * s
                rng = np.random.RandomState(d % (1 << 31))
                phase = 2.0 * np.pi * (d % 997) / 997.0
                x = (
                    amp * np.sin(2.0 * np.pi * f1 * i / sr_hz + phase)
                    + amp * np.sin(2.0 * np.pi * f2 * i / sr_hz + phase)
                    + noise_amp * rng.standard_normal(sr_hz)
                )
            else:
                x = amp * (
                    np.sin(2.0 * np.pi * f1 * i / sr_hz)
                    + np.sin(2.0 * np.pi * f2 * i / sr_hz)
                )
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


def synth_intro_pcm_udf(sr_hz: int = 16000, intro_s: float = 0.5,
                        content_s: float = 1.0, amp: float = 0.45):
    """Deterministic pcm_s16le clip per id (the q104 fixture): channel
    ``id % 5`` opens with a shared two-tone INTRO jingle (0.25 s at
    200 + 60*ch Hz, 0.25 s at 230 + 60*ch Hz — byte-identical across
    the channel, sample-0-aligned so every member frames it the same
    way), followed by per-id UNIQUE content (1 s at 1000 + id Hz, so
    content landmark hashes have document frequency 1).  Ids with
    id % 4 == 0 skip the intro (straight to content) — the planted
    no-boilerplate rows."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        n_half = int(sr_hz * intro_s / 2)
        n_content = int(sr_hz * content_s)
        ih = np.arange(n_half, dtype=np.float64)
        ic = np.arange(n_content, dtype=np.float64)
        for d in doc_id:
            d = int(d)
            ch = d % 5
            content = amp * np.sin(2.0 * np.pi * (1000.0 + d) * ic / sr_hz)
            if d % 4 == 0:
                x = content
            else:
                a = amp * np.sin(2.0 * np.pi * (200.0 + 60 * ch) * ih / sr_hz)
                b = amp * np.sin(2.0 * np.pi * (230.0 + 60 * ch) * ih / sr_hz)
                x = np.concatenate([a, b, content])
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


def synth_shared_pcm_udf(sr_hz: int = 16000, common_s: float = 0.8,
                         unique_s: float = 0.4, n_classes: int = 25,
                         amp: float = 0.45):
    """Deterministic pcm_s16le clip per id (the q106 fixture): class
    ``id % n_classes`` opens with a shared two-tone COMMON segment
    (common_s/2 at 300 + 10*cls Hz, common_s/2 at 550 + 10*cls Hz —
    byte-identical and sample-0-aligned across the class), followed by
    a per-id UNIQUE tail (unique_s at 1000 + id Hz).  Frequency pools
    are disjoint (class tones <= 790 Hz, unique tones >= 1000 Hz, 10 Hz
    class spacing vs sub-Hz interpolation error on clean tones), so
    landmark hashes never cross classes: within-class landmark-set
    Jaccard is a fixed mid value (common frames shared, tail + boundary
    frames per-id), cross-class exactly 0 — the partial-overlap regime
    the audio MinHash tier exists for."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        n_half = int(sr_hz * common_s / 2)
        n_unique = int(sr_hz * unique_s)
        ih = np.arange(n_half, dtype=np.float64)
        iu = np.arange(n_unique, dtype=np.float64)
        for d in doc_id:
            d = int(d)
            cls = d % n_classes
            a = amp * np.sin(2.0 * np.pi * (300.0 + 10 * cls) * ih / sr_hz)
            b = amp * np.sin(2.0 * np.pi * (550.0 + 10 * cls) * ih / sr_hz)
            tail = amp * np.sin(2.0 * np.pi * (1000.0 + d) * iu / sr_hz)
            x = np.concatenate([a, b, tail])
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


def synth_loop_pcm_udf(sr_hz: int = 16000, seg_len: int = 2048,
                       n_segs: int = 8, seg_step: float = 731.0,
                       amp: float = 0.4):
    """Deterministic pcm_s16le clip per id (the q108 fixture): an
    ``n_segs``-segment melody, segment s at 100 + 3*(id % 500) +
    seg_step*s Hz.  Ids with id % 3 == 0 are LOOPED: the first
    n_segs/2 segments play twice (period n_segs/2 * seg_len samples)
    — the audio analog of q99's stutter plant; every landmark of the
    first cycle recurs in the second.  Clean ids play n_segs distinct
    segments, so landmark hashes anchor (almost) uniquely.  seg_step
    chosen so the top frequency stays under Nyquist at the defaults
    (100 + 1497 + 731*7 = 6714 < 8000)."""

    @F.pandas_udf(T.BinaryType())
    def udf(doc_id: pd.Series) -> pd.Series:
        out = []
        total = seg_len * n_segs
        i = np.arange(total, dtype=np.float64)
        seg_all = np.arange(total) // seg_len
        half = n_segs // 2
        for d in doc_id:
            d = int(d)
            seg = seg_all % half if d % 3 == 0 else seg_all
            freq = 100.0 + 3.0 * (d % 500) + seg_step * seg
            x = amp * np.sin(2.0 * np.pi * freq * i / sr_hz)
            out.append(
                np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
            )
        return pd.Series(out)

    return udf


@F.pandas_udf(T.DoubleType())
def pairwise_snr_polarity_udf(ref_bytes: pd.Series, test_bytes: pd.Series) -> pd.Series:
    """Polarity-robust fidelity verifier: max of SNR(test, ref) and
    SNR(-test, ref).  A polarity-inverted copy (x -> -x: swapped balanced
    wiring, a DAW export flag) is the SAME recording to every spectral
    tier — |FFT| and therefore landmark hashes are sign-invariant — but
    its raw SNR is catastrophic (noise = 2x, ~ -6 dB against itself), so
    the plain verifier silently rejects exactly the pairs the candidate
    stage was right about.  Checking both signs costs one negation per
    pair and restores the verify; generalizing to arbitrary gain would
    be the matched-filter (correlation) verifier, which q71's
    gain-normalized pass covers."""
    out = np.empty(len(ref_bytes), dtype=np.float64)
    for i, (a, b) in enumerate(zip(ref_bytes, test_bytes)):
        if a is None or b is None:
            out[i] = np.nan
        else:
            ref = decode_pcm_s16le(a)
            test = decode_pcm_s16le(b)
            out[i] = max(snr_db(ref, test), snr_db(ref, -test))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def downmix_pcm_udf(payload: pd.Series) -> pd.Series:
    """Interleaved stereo pcm_s16le (LRLR...) -> mono pcm_s16le bytes,
    trunc((L+R)/2) per frame — the same toward-zero halves convention as
    ``downmix_stats_udf``, emitted as a payload instead of evidence ints
    so the mono result can feed the fingerprint/SNR dedup path (q117's
    channel-layout normalization).  Dual-mono input (L == R) reproduces
    the source EXACTLY; odd trailing bytes are dropped as torn frames."""
    out = []
    for b in payload:
        if b is None or len(b) < 4:
            out.append(b"")
            continue
        x = np.frombuffer(b, dtype="<i2").astype(np.int64)
        n = len(x) // 2
        left, right = x[0 : 2 * n : 2], x[1 : 2 * n : 2]
        m = np.trunc((left + right) / 2.0).astype("<i2")
        out.append(m.tobytes())
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def mono_to_stereo_pcm_udf(payload: pd.Series) -> pd.Series:
    """Mono pcm_s16le -> dual-mono interleaved stereo (L = R = source) —
    the most common channel-layout re-encode in the wild (a mono
    recording shipped in a stereo container); byte-doubling, content
    identical.  The q117 fixture's planted transformation."""
    out = []
    for b in payload:
        if b is None:
            out.append(None)
            continue
        x = np.frombuffer(b, dtype="<i2")
        st = np.empty(2 * len(x), dtype="<i2")
        st[0::2] = x
        st[1::2] = x
        out.append(st.tobytes())
    return pd.Series(out)

def echo_pcm_udf(gain: float = 0.45, delay: int = 523):
    """Apply a single-reflection ECHO to pcm_s16le: y = (x + gain *
    x[. - delay]) / (1 + gain), re-quantized — the 2-tap convolutive
    channel (room reflection / mix-bus send) that defeats every
    waveform-aligned verify while leaving spectral peaks in place:
    |H(f)| = |1 + gain*e^{-i w delay}| stays within [1-gain, 1+gain], so
    with gain < 1 no tone is nulled and landmark candidates survive."""

    @F.pandas_udf(T.BinaryType())
    def udf(payload: pd.Series) -> pd.Series:
        out = []
        for p in payload:
            if p is None:
                out.append(None)
                continue
            x = np.frombuffer(p, dtype="<i2").astype(np.float64)
            y = x.copy()
            if len(x) > delay:
                y[delay:] += gain * x[:-delay]
            y = y / (1.0 + gain)
            y = np.clip(np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)),
                        -32768, 32767)
            out.append(y.astype("<i2").tobytes())
        return pd.Series(out)

    return udf


def echofit_snr(x: np.ndarray, y: np.ndarray, max_delay: int = 800):
    """Channel-equalized SNR: fit the best 2-tap filter y ~ g0*x +
    g1*x[. - d] over EVERY candidate delay d in [1, max_delay] (closed-
    form least squares per d from FFT correlation sequences — O(n log n)
    total, no per-d recomputation) and return (snr_db, best_delay).

    Why full search instead of a cross-correlation argmax: on tonal /
    quasi-periodic content the cross-correlation has near-equal peaks at
    many lags, and a wrong lag cannot fit a 3-tone channel (2 real taps
    + the delay must reproduce 3 complex per-tone gains — solvable only
    at the true delay), measured 7.2 dB argmax-picked vs 83.8 dB full
    search on the q124 fixture.  A pair that is NOT a 2-tap-channel
    rendition cannot fake this: a tone present in y but absent from x
    survives every fit as residual (cross-class pairs measured
    <= 9.5 dB)."""
    n = min(len(x), len(y))
    if n == 0 or max_delay < 1 or n <= max_delay:
        return float("-inf"), 0
    x, y = x[:n], y[:n]
    m = 2 * n
    X = np.fft.rfft(x, m)
    Y = np.fft.rfft(y, m)
    cxy = np.fft.irfft(Y * np.conj(X), m)[: max_delay + 1]
    axx = np.fft.irfft(X * np.conj(X), m)[: max_delay + 1]
    cum = np.cumsum(x**2)
    exx = float(cum[-1])
    ds = np.arange(1, max_delay + 1)
    exd = cum[n - 1 - ds]  # energy of x[:-d]
    a12 = axx[1:]
    b1 = cxy[0]
    b2 = cxy[1:]
    det = exx * exd - a12 * a12
    det = np.where(np.abs(det) < 1e-18, 1e-18, det)
    g0 = (b1 * exd - b2 * a12) / det
    g1 = (b2 * exx - b1 * a12) / det
    yy = float(y @ y)
    resid = np.maximum(yy - (g0 * b1 + g1 * b2), 1e-18)
    best = int(np.argmin(resid))
    if yy == 0.0:
        return float("-inf"), 0
    return 10.0 * np.log10(yy / resid[best]), int(ds[best])


def pairwise_snr_echofit_udf(max_delay: int = 800):
    """(ref_bytes, test_bytes) -> channel-equalized SNR (dB): the
    echo-invariant generalization of ``pairwise_snr_bestgain_udf``
    (a 1-tap channel is the g1=0 special case).

    Per-batch MEMOIZATION of the ref-side state: in a verify batch a
    clip appears in many candidate pairs (a 25-member congruence class
    contributes ~300 pairs per clip at sf0.1), and the ref side of the
    2-tap fit needs its forward FFT, autocorrelation, and energy
    prefix-slice only once — cached per distinct payload, bounded (the
    cache resets at 512 entries; ~0.3 MB per entry).  A fully stacked
    batch variant was measured SLOWER end-to-end (the (uniques x 2n)
    complex matrices ran to GBs per worker and alloc churn ate the FFT
    savings), so only the re-usable per-clip state is cached and the
    per-pair cross-correlation stays a single irfft.  Numerically
    identical to :func:`echofit_snr` per pair (asserted in tests)."""

    @F.pandas_udf(T.DoubleType())
    def udf(ref_bytes: pd.Series, test_bytes: pd.Series) -> pd.Series:
        out = np.full(len(ref_bytes), np.nan)
        cache: dict[tuple[bytes, int], tuple] = {}
        for i, (a, b) in enumerate(zip(ref_bytes, test_bytes)):
            if a is None or b is None:
                continue
            n = min(len(a), len(b)) // 2
            if n == 0 or n <= max_delay:
                out[i] = float("-inf")
                continue
            m = 2 * n
            key = (a, n)
            st = cache.get(key)
            if st is None:
                if len(cache) >= 512:
                    cache.clear()
                x = decode_pcm_s16le(a)[:n]
                X = np.fft.rfft(x, m)
                axx = np.fft.irfft(X * np.conj(X), m)[1 : max_delay + 1]
                cum = np.cumsum(x**2)
                exx = float(cum[-1])
                ds = np.arange(1, max_delay + 1)
                exd = cum[n - 1 - ds]
                st = (X, axx, exx, exd)
                cache[key] = st
            X, axx, exx, exd = st
            y = decode_pcm_s16le(b)[:n]
            Y = np.fft.rfft(y, m)
            cxy = np.fft.irfft(Y * np.conj(X), m)[: max_delay + 1]
            b1 = cxy[0]
            b2 = cxy[1:]
            det = exx * exd - axx * axx
            det = np.where(np.abs(det) < 1e-18, 1e-18, det)
            g0 = (b1 * exd - b2 * axx) / det
            g1 = (b2 * exx - b1 * axx) / det
            yy = float(y @ y)
            resid = np.maximum(yy - (g0 * b1 + g1 * b2), 1e-18)
            best = float(resid.min())
            out[i] = (
                10.0 * np.log10(yy / best) if yy > 0.0 else float("-inf")
            )
        return pd.Series(out)

    return udf

def reencode_pcm_udf(gain: float = 0.5, shift: int = 300, noise_amp: float = 0.002):
    """The COMPOSITE re-encode transformation — volume normalization x
    leading-silence trim/pad x dither in one pass: y = gain * x[. -
    shift] (zero-padded head) + seeded noise, re-quantized.  Seeded by a
    blake2b of the payload itself so distinct inputs get distinct
    dither (deterministic, engine-free)."""

    @F.pandas_udf(T.BinaryType())
    def udf(payload: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for p in payload:
            if p is None:
                out.append(None)
                continue
            x = np.frombuffer(p, dtype="<i2").astype(np.float64)
            y = np.zeros_like(x)
            if len(x) > shift:
                y[shift:] = gain * x[:-shift]
            seed = int.from_bytes(
                hashlib.blake2b(p, digest_size=4).digest(), "little"
            )
            y = y + noise_amp * 32768.0 * np.random.RandomState(seed).randn(
                len(x)
            )
            y = np.clip(np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)),
                        -32768, 32767)
            out.append(y.astype("<i2").tobytes())
        return pd.Series(out)

    return udf
