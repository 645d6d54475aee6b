"""Property-based round-trips for the vendored codecs (Hypothesis).

The example-based tests pin known shapes; these drive arbitrary sizes,
channel counts and sample values through encode->decode and require
bit-exact recovery — the codec contract that every downstream
real-pixel / real-audio operator silently depends on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from beehive_spark.functions.audio import decode_wav, encode_wav
from beehive_spark.functions.png import decode_png, encode_png


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(w, h, ch, seed):
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, ch), dtype=np.uint8
    )
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
)
def test_wav_roundtrip_any_samples(samples, rate):
    got_rate, got = decode_wav(encode_wav(samples, rate=rate))
    assert got_rate == rate and got == samples


@settings(max_examples=20, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_codecs_reject_junk_instead_of_garbling(junk):
    """Arbitrary bytes must raise, never decode to wrong data.  (A PNG
    signature prefix alone is still junk without valid chunks.)"""
    import pytest

    if not junk.startswith(b"\x89PNG\r\n\x1a\n"):
        with pytest.raises(ValueError):
            decode_png(junk)
    if not junk.startswith(b"RIFF"):
        with pytest.raises(NotImplementedError):
            decode_wav(junk)


@settings(max_examples=20, deadline=None)
@given(
    samples=st.lists(st.integers(-40000, 40000), min_size=1, max_size=200),
    rate=st.sampled_from([8000, 16000]),
)
def test_wav_ndarray_path_bytes_identical_and_rejects_floats(samples, rate):
    """The vectorized ndarray fast path must produce byte-identical
    WAV output to the list path on integer input, and REJECT float
    arrays (the list path raises struct.error on floats; silently
    truncating toward zero would diverge — r9 advisory)."""
    import pytest

    clamped = [max(-32768, min(32767, s)) for s in samples]
    assert encode_wav(
        np.asarray(samples, dtype=np.int64), rate=rate
    ) == encode_wav(clamped, rate=rate)
    with pytest.raises(TypeError):
        encode_wav(np.asarray(samples, dtype=np.float64), rate=rate)
