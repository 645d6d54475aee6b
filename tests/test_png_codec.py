"""Vendored pure-Python PNG codec (`functions/png.py`): round-trips,
all five scanline filter types, and rejection of unsupported input."""

import struct
import zlib

import numpy as np
import pytest

from beehive_spark.functions.png import _CHANNELS, _SIG, decode_png, encode_png


def test_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for shape in [(5, 7), (5, 7, 1), (4, 6, 2), (8, 3, 3), (2, 2, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        rt = decode_png(encode_png(px))
        want = px[:, :, None] if px.ndim == 2 else px
        assert np.array_equal(rt, want), shape


def _external_png(filters, px):
    """Hand-roll a PNG using the given per-row filter types — an
    encoder independent of encode_png, covering the decode paths our
    own (filter-0-only) encoder never produces."""
    h, w, ch = px.shape
    raws = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        enc = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = (
                px[y - 1].reshape(-1).astype(np.int32)[x - ch]
                if (x >= ch and y)
                else 0
            )
            if f == 0:
                enc[x] = line[x]
            elif f == 1:
                enc[x] = (line[x] - a) % 256
            elif f == 2:
                enc[x] = (line[x] - b) % 256
            elif f == 3:
                enc[x] = (line[x] - ((a + b) >> 1)) % 256
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        raws.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = line
    raw = b"".join(raws)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    color_type = {v: k for k, v in _CHANNELS.items()}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_handles_every_filter_type(filters):
    px = np.random.default_rng(11).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_external_png(filters, px)), px)


def test_rejects_non_png_and_unsupported_variants():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    # palette (color type 3) is out of scope
    bad = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    ihdr_off = len(_SIG) + 8
    bad[ihdr_off + 9] = 3  # color_type byte inside IHDR
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(bad))


def test_truncated_and_corrupt_streams_raise_valueerror():
    """struct.error / zlib.error must fold into the ValueError contract
    (review finding — the junk-fuzz test cannot reach these because
    random bytes never carry the 8-byte signature)."""
    px = np.random.default_rng(5).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_png(px)
    # cuts through IHDR and inside IDAT; cutting only the trailing IEND
    # chunk leaves complete pixel data and legitimately still decodes
    for cut in (9, 12, 20, len(good) - 20):
        with pytest.raises(ValueError):
            decode_png(good[:cut])
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # inside the IDAT payload
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))
