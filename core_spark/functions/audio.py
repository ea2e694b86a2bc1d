"""Audio codec decode + per-clip features as Arrow-vectorized pandas UDFs.

The engine's per-row invariant (BASELINE.json): decoded PCM must match the
generator's float PCM with SNR >= 30 dB, and transcripts must survive the
pipeline byte-identical. Codecs are pcm16 (int16 LE) and G.711 mu-law —
both decodable in pure numpy, so expected energy is analytically known
(pure sine => mean-square = A^2/2).

Design rules (north rule: never per-row Python):
- All decode/feature computation happens inside ``pandas_udf`` bodies
  operating on Arrow record batches: one Python invocation per ~10k rows,
  numpy-vectorized inside.
- The variable-length inner loop (clips have different lengths) uses
  numpy.frombuffer per clip — zero-copy views over Arrow buffers — and the
  reductions (energy, peak) are O(n) numpy ops. For equal batch shapes this
  is the same work a dedicated audio engine would do.
- Feature UDFs (energy/duration/peak) return scalars, so shuffles carry
  8-byte doubles, never decoded PCM. Full PCM decode (``decode_pcm``)
  exists for pipelines that need frames downstream, but windowed aggregates
  should use the scalar UDFs.

The reference's only binary transformer is cast-to-string
(binary_to_string.py:79-86); this module is its engine-grade inverse.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- codecs

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def pcm16_encode(x: np.ndarray) -> bytes:
    """float [-1,1] -> int16 LE bytes."""
    q = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    return q.tobytes()


def pcm16_decode(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i2").astype(np.float32) / 32767.0


def ulaw_encode(x: np.ndarray) -> bytes:
    """float [-1,1] -> G.711 mu-law bytes (vectorized, standard algorithm)."""
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype(np.int32)
    sign = np.where(pcm < 0, 0x80, 0)
    mag = np.clip(np.abs(pcm), 0, _ULAW_CLIP) + _ULAW_BIAS
    exponent = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exponent = np.clip(exponent, 0, 7)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    u = ~(sign | (exponent << 4) | mantissa) & 0xFF
    return u.astype(np.uint8).tobytes()


def _build_ulaw_lut() -> np.ndarray:
    """All 256 mu-law codes decoded once -> int16 LUT; per-clip decode is
    then a single gather instead of six int32 temporaries per clip. Kept in
    int16 (max magnitude 32124 fits) so the Arrow hot path can stay 2 B per
    sample; the float32 [-1,1] LUT is derived from it."""
    u = (~np.arange(256, dtype=np.int32)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = ((mantissa << 3) + _ULAW_BIAS) << exponent
    pcm = mag - _ULAW_BIAS
    pcm = np.where(sign != 0, -pcm, pcm)
    return pcm.astype(np.int16)


ULAW_LUT_I16 = _build_ulaw_lut()
ULAW_LUT = ULAW_LUT_I16.astype(np.float32) / 32767.0


def ulaw_decode(b: bytes) -> np.ndarray:
    return ULAW_LUT[np.frombuffer(b, dtype=np.uint8)]


def _build_alaw_lut() -> np.ndarray:
    """G.711 A-law: all 256 codes decoded once (ITU G.711 / classic
    alaw2linear), gathered per clip like the mu-law LUT."""
    out = np.empty(256, dtype=np.float32)
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[code] = (t if (a & 0x80) else -t) / 32768.0
    return out


ALAW_LUT = _build_alaw_lut()

_ALAW_SEG_END = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32
)


def alaw_encode(x: np.ndarray) -> bytes:
    """float [-1,1] -> G.711 A-law bytes (vectorized linear2alaw)."""
    pcm = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int32)
    mask = np.where(pcm >= 0, 0xD5, 0x55).astype(np.int32)
    mag = np.where(pcm >= 0, pcm, -pcm - 8)
    mag = np.maximum(mag, 0)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left").astype(np.int32)
    full = seg >= 8
    seg_c = np.minimum(seg, 7)
    shift = np.where(seg_c < 2, 4, seg_c + 3)
    aval = (seg_c << 4) | ((mag >> shift) & 0x0F)
    aval = np.where(full, 0x7F, aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8).tobytes()


def alaw_decode(b: bytes) -> np.ndarray:
    return ALAW_LUT[np.frombuffer(b, dtype=np.uint8)]


# IMA ADPCM (DVI4): 4 bits/sample with a predictive state machine. Block
# format here: 4-byte header (int16 LE predictor, uint8 step index, 1
# reserved) + packed nibbles, low nibble first. The decode is inherently
# sequential (each step feeds the next), so it is an O(n) Python loop —
# correct and deterministic, but ~100x slower than the LUT codecs; real
# deployments would swap in a native decoder via the _DECODERS registry,
# which is exactly the injection point this entry demonstrates.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    step = int(_IMA_STEPS[idx])
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if (nib & 8) else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_IMA_INDEX[nib & 7])))
    return pred, idx


def adpcm_encode(x: np.ndarray) -> bytes:
    """float [-1,1] -> IMA ADPCM block (4-byte header + packed nibbles)."""
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype(np.int32)
    n = len(pcm)
    pred, idx = (int(pcm[0]) if n else 0), 0
    nibs = bytearray()
    for s in pcm:
        step = int(_IMA_STEPS[idx])
        delta = int(s) - pred
        nib = 8 if delta < 0 else 0
        if delta < 0:
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, idx = _ima_step(pred, idx, nib)
        nibs.append(nib)
    header = int(pcm[0] if n else 0).to_bytes(2, "little", signed=True) + bytes(
        [0, 0]
    )
    packed = bytearray()
    for k in range(0, len(nibs), 2):
        lo = nibs[k]
        hi = nibs[k + 1] if k + 1 < len(nibs) else 0
        packed.append(lo | (hi << 4))
    return header + bytes(packed)


def adpcm_decode(b: bytes) -> np.ndarray:
    if len(b) < 4:
        return _EMPTY_F32
    pred = int.from_bytes(b[:2], "little", signed=True)
    idx = 0
    packed = np.frombuffer(b, dtype=np.uint8, offset=4)
    nibs = np.empty(2 * len(packed), dtype=np.uint8)
    nibs[0::2] = packed & 0x0F
    nibs[1::2] = packed >> 4
    out = np.empty(len(nibs), dtype=np.float32)
    for k, nib in enumerate(nibs):
        pred, idx = _ima_step(pred, idx, int(nib))
        out[k] = pred
    return out / 32767.0


_DECODERS = {
    "pcm16": pcm16_decode,
    "ulaw": ulaw_decode,
    "alaw": alaw_decode,
    "adpcm": adpcm_decode,
}
#: encoded length -> decoded sample count, keyed like _DECODERS
_SAMPLE_COUNT = {
    "pcm16": lambda nbytes: nbytes // 2,
    "ulaw": lambda nbytes: nbytes,
    "alaw": lambda nbytes: nbytes,
    "adpcm": lambda nbytes: max(0, nbytes - 4) * 2,
}
_EMPTY_F32 = np.empty(0, dtype=np.float32)


def _decode_one(b: bytes | None, codec: str) -> np.ndarray:
    if b is None:
        # null payload (failed ingest, outer-join product): zero samples,
        # so every downstream feature degrades to its empty-clip value
        # instead of killing the stage with a worker TypeError
        return _EMPTY_F32
    try:
        return _DECODERS[codec](b)
    except KeyError:
        raise ValueError(f"unknown codec: {codec!r}") from None


def decode_batch(data: pd.Series, codec: pd.Series) -> list[np.ndarray]:
    """Decode one Arrow batch of clips, materializing every PCM array.

    NOTE: holding thousands of ~100 KB arrays concurrently makes the page
    -fault path the bottleneck when many executor cores run this at once
    (minor-fault handling serializes kernel-side; measured 10-30x wall
    blow-up at 8-way concurrency on this host). Use only where the decoded
    frames themselves are the output (decode_pcm); every reducing feature
    UDF below streams clip-by-clip instead — decode one, reduce, discard —
    which keeps the worker's working set flat and its allocator in steady
    state. That fused shape is also the only one that survives 100 TB.
    """
    codec_arr = codec.to_numpy()
    data_arr = data.to_numpy()
    return [_decode_one(b, c) for b, c in zip(data_arr, codec_arr)]


# ---------------------------------------------------------------- pandas UDFs


@F.pandas_udf(T.ArrayType(T.FloatType()))
def decode_pcm(data: pd.Series, codec: pd.Series) -> pd.Series:
    """bytes + codec -> float32 PCM frames. Use only when frames are needed
    downstream; prefer the scalar feature UDFs in aggregation paths."""
    return pd.Series(decode_batch(data, codec))


def _reduce_clips(data: pd.Series, codec: pd.Series, fn) -> pd.Series:
    """Fused decode->reduce->discard over one Arrow batch: only one decoded
    clip is ever resident, so the allocator stays in steady state (see
    decode_batch docstring for why that matters at high core counts)."""
    codec_arr = codec.to_numpy()
    data_arr = data.to_numpy()
    return pd.Series(
        [fn(_decode_one(b, c)) for b, c in zip(data_arr, codec_arr)]
    )


def _energy(p: np.ndarray) -> float:
    return float(np.mean(np.square(p, dtype=np.float64))) if len(p) else 0.0


@F.pandas_udf(T.DoubleType())
def clip_energy(data: pd.Series, codec: pd.Series) -> pd.Series:
    """Mean-square energy of the decoded clip (pure sine => A^2/2)."""
    return _reduce_clips(data, codec, _energy)


@F.pandas_udf(T.DoubleType())
def clip_rms(data: pd.Series, codec: pd.Series) -> pd.Series:
    return _reduce_clips(data, codec, lambda p: float(np.sqrt(_energy(p))))


@F.pandas_udf(T.DoubleType())
def clip_peak(data: pd.Series, codec: pd.Series) -> pd.Series:
    return _reduce_clips(data, codec, lambda p: float(np.max(np.abs(p))) if len(p) else 0.0)


@F.pandas_udf(T.IntegerType())
def decoded_samples(data: pd.Series, codec: pd.Series) -> pd.Series:
    """Sample count of the decoded clip — with sr_hz gives decoded duration;
    mismatch vs dur_ms flags a corrupt payload. Same error/null surface as
    the decoders: unknown codec -> ValueError, null bytes -> 0 samples."""
    out = []
    for b, c in zip(data.to_numpy(), codec.to_numpy()):
        try:
            count = _SAMPLE_COUNT[c]
        except KeyError:
            raise ValueError(f"unknown codec: {c!r}") from None
        out.append(0 if b is None else count(len(b)))
    return pd.Series(out).astype("int32")


_N_FFT = 512
_HOP = 160  # 10 ms at 16 kHz — the standard STFT hop for speech analysis
_HANN = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(_N_FFT) / _N_FFT)


def _frame(x: np.ndarray, n: int = _N_FFT, hop: int = _HOP) -> np.ndarray:
    """Zero-copy strided frame view (n_frames, n); pads a short clip."""
    if len(x) < n:
        x = np.pad(x, (0, n - len(x)))
    n_frames = 1 + (len(x) - n) // hop
    stride = x.strides[0]
    return np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, n), strides=(hop * stride, stride), writeable=False
    )


_HANN32 = _HANN.astype(np.float32)
# Fixed-size windowed-frame scratch: the FFT runs over <=128-frame chunks so
# each worker's hot working set stays ~0.5 MB regardless of clip length.
# A full-clip frame matrix (up to ~550x512 float32 + complex64 spectrum) puts
# 28 concurrent workers ~60+ MB into shared L3 — measured 28-core throughput
# drops ~2x vs this chunked shape (probe: 23.4k -> 31.4k clips/sec, N->4N
# scaling efficiency 0.70 -> 0.94).
# env-tunable so the bench can A/B the per-worker hot-set size at the
# whole-host (24-worker) footprint, where aggregate scratch approaches the
# shared LLC: 128 frames ~= 1.3 MB hot per worker (f32 buf + f64 upcast +
# c128 spectrum), 64 ~= 0.65 MB. Measured on the quiet host (pinned
# kernel-only workers, best of 2): chunk 64 beats 128 by ~12% at 6 workers
# (2718 vs 2418 clips/s) and ~15% at 24 (10608 vs 9260) with slightly
# better 6->24 scaling (0.976 vs 0.957) — the smaller scratch keeps
# 24 x hot-set inside the shared LLC where 128 spills it; 32 gains nothing
# further (per-chunk FFT dispatch overhead starts to show).
import os as _os

_CHUNK_FRAMES = int(_os.environ.get("SPARK_GRAFT_FFT_CHUNK", "64"))
# thread-local scratch: Spark's Python workers are single-threaded per
# process, but a threaded driver-side caller (batch scoring harness) must
# not share one buffer between interleaved _spectral_one calls
import threading as _threading

_FFT_TLS = _threading.local()


def _fft_buf() -> np.ndarray:
    buf = getattr(_FFT_TLS, "buf", None)
    if buf is None:
        buf = _FFT_TLS.buf = np.empty((_CHUNK_FRAMES, _N_FFT), dtype=np.float32)
    return buf


def _spectral_one(x: np.ndarray, sr: int) -> tuple:
    """Framed-FFT features of one decoded clip. float32 windowed frames
    (features agree with float64 to ~1e-6 relative, far inside the engine's
    SNR>=30dB audio invariant), float64 reductions; chunked over a fixed
    scratch (above) so the hot working set stays cache-resident."""
    n = len(x)
    if n == 0:
        return (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0)
    x32 = x.astype(np.float32, copy=False)
    energy = float(np.dot(x32, x32)) / n
    # max(max, -min) == max|x| with two temp-free reductions instead of a
    # full |x| temporary
    peak = float(max(x32.max(), -float(x32.min())))
    zcr = float(np.count_nonzero(np.signbit(x32[1:]) != np.signbit(x32[:-1]))) / n
    fr = _frame(x32)
    nf = fr.shape[0]
    # numpy's pocketfft wrapper computes rfft in double regardless of input
    # dtype (complex128 out); accumulate |spec|^2 by viewing the complex
    # buffer as contiguous (re, im) float64 pairs and einsum-squaring in ONE
    # fused pass — vs spec.real*spec.real + spec.imag*spec.imag, which
    # allocates three ~200 KB strided temporaries per chunk (measured
    # 474 -> 391 us/clip on the fft+power stage, and the removed temporary
    # traffic is exactly the shared-LLC pressure that costs the 24-worker
    # level more than the 6-worker level)
    psum2 = np.zeros(2 * (_N_FFT // 2 + 1), dtype=np.float64)
    for st in range(0, nf, _CHUNK_FRAMES):
        ch = fr[st : st + _CHUNK_FRAMES]
        buf = _fft_buf()[: ch.shape[0]]
        np.multiply(ch, _HANN32, out=buf)
        spec = np.fft.rfft(buf, axis=1)
        v = spec.view(np.float64)
        psum2 += np.einsum("ij,ij->j", v, v)
    power = (psum2[0::2] + psum2[1::2]) / nf  # (257,) mean power spectrum
    power[0] = 0.0  # exclude DC from dominant-bin search
    freqs = np.arange(len(power)) * (sr / _N_FFT)
    tot = float(power.sum())
    dom = float(freqs[int(np.argmax(power))])
    centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
    # band energy fractions at fixed Hz edges (telephony-ish bands)
    lo = float(power[freqs < 300.0].sum() / tot) if tot > 0 else 0.0
    hi = float(power[freqs >= 3400.0].sum() / tot) if tot > 0 else 0.0
    return (energy, peak, zcr, dom, centroid, lo, hi, nf)


def _spectral_one_i16(x: np.ndarray, sr: int) -> tuple:
    """``_spectral_one`` over int16 PCM — the Arrow hot path's variant.

    Keeping samples at 2 B each (pcm16 payloads are a zero-copy reinterpret
    of the Arrow buffer; ulaw gathers through the int16 LUT) halves the
    decoded-sample memory traffic of the float32 path: at 4 concurrent
    pinned executors the N-vs-4N scaling bench is bandwidth-capped, not
    compute-capped (probe: the FFT-less pipeline scales at 0.47 while the
    FFT-heavy one reaches 0.79 — data movement IS the ceiling), so bytes
    saved here convert directly into fleet throughput. The windowed-frame
    scratch converts int16 -> float32 per cache-resident chunk; spectral
    shape features (dominant/centroid/band fractions) are scale-invariant,
    and energy/peak renormalize by 32767 exactly, so outputs match the
    float path to float32 rounding (~1e-7 relative)."""
    n = len(x)
    if n == 0:
        return (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0)
    energy = float(np.einsum("i,i->", x, x, dtype=np.int64)) / (32767.0 * 32767.0) / n
    peak = float(max(int(x.max()), -int(x.min()))) / 32767.0
    zcr = float(np.count_nonzero((x[1:] < 0) != (x[:-1] < 0))) / n
    fr = _frame(x)
    nf = fr.shape[0]
    psum2 = np.zeros(2 * (_N_FFT // 2 + 1), dtype=np.float64)
    for st in range(0, nf, _CHUNK_FRAMES):
        ch = fr[st : st + _CHUNK_FRAMES]
        buf = _fft_buf()[: ch.shape[0]]
        np.multiply(ch, _HANN32, out=buf)  # int16 * f32 -> f32, in scratch
        spec = np.fft.rfft(buf, axis=1)
        v = spec.view(np.float64)
        psum2 += np.einsum("ij,ij->j", v, v)
    power = (psum2[0::2] + psum2[1::2]) / nf
    power[0] = 0.0
    freqs = np.arange(len(power)) * (sr / _N_FFT)
    tot = float(power.sum())
    dom = float(freqs[int(np.argmax(power))])
    centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
    lo = float(power[freqs < 300.0].sum() / tot) if tot > 0 else 0.0
    hi = float(power[freqs >= 3400.0].sum() / tot) if tot > 0 else 0.0
    return (energy, peak, zcr, dom, centroid, lo, hi, nf)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("energy", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("dominant_freq_hz", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("band_low_frac", T.DoubleType()),
        T.StructField("band_high_frac", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


@F.pandas_udf(AUDIO_FEATURES_SCHEMA)
def audio_features(data: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
    """Single-decode-pass per-clip DSP feature set (framed 512-pt FFT).

    The synthetic generator's pure sine makes two of these analytically
    verifiable: energy == A^2/2 and dominant_freq_hz == the clip's sine
    frequency (within one 512-bin width). This is the engine's heavy
    vectorized path — the decode+FFT work that at 100 TB dominates the
    pipeline and must scale with cores (north rule N vs 4N)."""
    codec_arr = codec.to_numpy()
    data_arr = data.to_numpy()
    sr = sr_hz.to_numpy()
    # fused decode->feature->discard per clip (see decode_batch docstring)
    rows = [
        _spectral_one(_decode_one(b, c), int(s))
        for b, c, s in zip(data_arr, codec_arr, sr)
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "energy", "peak", "zcr", "dominant_freq_hz",
            "spectral_centroid_hz", "band_low_frac", "band_high_frac", "n_frames",
        ],
    )


# Multimodal stub: image/video feature extraction plumbing. The decode
# libraries are not in this container; the Spark-side contract (binary in,
# typed struct out, Arrow batching) is real and tested with the fake.
@F.pandas_udf(T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
]))
def probe_media(data: pd.Series) -> pd.DataFrame:
    """STUB: deterministic fake media probe (real impl needs pillow/ffmpeg,
    not installed here). Derives fake-but-stable dims from payload length."""
    n = data.str.len().fillna(0).astype("int64")
    return pd.DataFrame(
        {
            "width": (16 + (n % 64)).astype("int32"),
            "height": (16 + (n % 48)).astype("int32"),
            "n_frames": (1 + (n % 8)).astype("int32"),
        }
    )


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of decoded vs reference PCM, in dB."""
    n = min(len(reference), len(decoded))
    if n == 0:
        return float("inf")
    ref = reference[:n].astype(np.float64)
    err = ref - decoded[:n].astype(np.float64)
    p_sig = float(np.mean(ref**2))
    p_err = float(np.mean(err**2))
    if p_err == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_err)
