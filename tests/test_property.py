"""Property-based tests (hypothesis) for the pure-numpy kernels.

These pin the engine's per-row invariants over the input space rather than
hand-picked examples: codec round-trip SNR (BASELINE per-row invariant),
winnowing's coverage guarantee, and bucket-math consistency."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from core_spark.functions import audio as au
from core_spark.operators.dedup import _winnow_one


def _snr_db(ref: np.ndarray, dec: np.ndarray) -> float:
    noise = ref - dec
    p_sig = float(np.mean(ref * ref))
    p_noise = float(np.mean(noise * noise))
    if p_noise == 0:
        return np.inf
    return 10.0 * np.log10(p_sig / p_noise)


signals = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=32,
    max_size=2048,
)


@settings(max_examples=50, deadline=None)
@given(signals)
def test_pcm16_roundtrip_snr(xs):
    x = np.asarray(xs, dtype=np.float32)
    if float(np.mean(x * x)) < 1e-4:
        x = x + 0.1  # SNR undefined for silence; shift to a live signal
    dec = au.pcm16_decode(au.pcm16_encode(x))
    assert len(dec) == len(x)
    # int16 quantization: SNR >= 30 dB for any signal with power >= 1e-4
    assert _snr_db(x.astype(np.float64), dec.astype(np.float64)) >= 30.0


@settings(max_examples=50, deadline=None)
@given(signals)
def test_ulaw_roundtrip_snr(xs):
    x = np.asarray(xs, dtype=np.float32)
    if float(np.mean(x * x)) < 1e-2:
        x = x + 0.3
    dec = au.ulaw_decode(au.ulaw_encode(x))
    assert len(dec) == len(x)
    # G.711 mu-law: ~38 dB SNR for speech-level signals; 30 dB is the
    # engine's per-row invariant floor (BASELINE input_hint)
    assert _snr_db(x.astype(np.float64), dec.astype(np.float64)) >= 30.0


def test_ulaw_lut_exhaustive_roundtrip():
    """Every one of the 256 mu-law codes is a fixed point in VALUE space:
    decode -> encode -> decode reproduces the decoded value exactly.
    (Code-space identity does not hold for all codes — mu-law has two zero
    codes (0x7F/0xFF) and clip-range aliases — but the decoded value must
    survive a re-encode cycle bit-for-bit.)"""
    codes = np.arange(256, dtype=np.uint8).tobytes()
    dec = au.ulaw_decode(codes)
    dec2 = au.ulaw_decode(au.ulaw_encode(dec))
    assert np.array_equal(dec, dec2)


texts = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=300
)


@settings(max_examples=100, deadline=None)
@given(texts, st.integers(min_value=2, max_value=6), st.integers(min_value=2, max_value=8))
def test_winnow_coverage_guarantee(s, k, w):
    """Winnowing invariant: every window of w consecutive k-grams contributes
    at least one selected fingerprint — so any shared substring of length
    >= k+w-1 between two docs is guaranteed a common fingerprint."""
    fps = set(_winnow_one(s, k, w).tolist())
    if len(s) < k:
        assert len(fps) == 1
        return
    n = len(s) - k + 1
    # recompute hashes exactly like the kernel
    b = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
    v = np.zeros(n, dtype=np.int64)
    for i in range(k):
        v |= b[i : i + n] << (8 * (k - 1 - i))
    from core_spark.operators.dedup import _splitmix64

    with np.errstate(over="ignore"):
        h = _splitmix64(v.astype(np.uint64)).astype(np.int64)
    if n <= w:
        assert fps & set(h.tolist())
        return
    for st_ in range(0, n - w + 1):
        window = set(h[st_ : st_ + w].tolist())
        assert window & fps, f"window at {st_} has no selected fingerprint"


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2_000_000_000),
    st.sampled_from([60, 300, 3600, 21600, 86400]),
)
def test_bucket_math_consistency(epoch, every):
    """floor(epoch/every)*every (the engine + oracle bucket formula) is
    idempotent, aligned, and never after the input."""
    b = (epoch // every) * every
    assert b % every == 0
    assert b <= epoch < b + every
    assert (b // every) * every == b
