"""Audio column plumbing — stdlib WAV codec, Arrow-batched features.

The audio sibling of ``functions/multimodal.py``'s image tier: audio
payloads are opaque ``binary`` columns; the codec is Python's stdlib
``wave`` module (a REAL container format — RIFF/WAVE PCM — with no
third-party dependency), so the decode path executes on real
compressed-container bytes in any environment, mirroring how
``functions/png.py`` unlocks the image path.

Only PCM WAV is handled; other formats raise NotImplementedError, the
same explicit-request contract as the image tier (a real pipeline
plugs ffmpeg/torchaudio in here — the Spark-side shapes below do not
change).

Reference scope: net-new (the reference is relational-only).
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_wav(samples, rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV from integer samples (each clamped to
    int16).  Accepts a list or a numpy array; the array path clamps
    and packs vectorized — the difference is ~8x wall-clock when a
    synthesis stage renders thousands of clips per Arrow batch
    (STRESS attribution of media_audio_vad, r9), the bytes produced
    are identical."""
    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        if isinstance(samples, np.ndarray):
            if samples.dtype.kind not in ("i", "u"):
                # the list path rejects floats (struct.pack 'h' raises);
                # the vectorized path must enforce the same
                # integer-samples contract instead of silently
                # truncating toward zero (r9 advisory)
                raise TypeError(
                    "encode_wav expects integer samples; got dtype "
                    f"{samples.dtype} — round/cast explicitly first"
                )
            w.writeframes(
                np.clip(samples, -32768, 32767).astype("<i2").tobytes()
            )
        else:
            clamped = [max(-32768, min(32767, s)) for s in samples]
            w.writeframes(struct.pack(f"<{len(clamped)}h", *clamped))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """(frame_rate, samples) from mono 16-bit PCM WAV bytes; raises
    NotImplementedError for anything the stdlib codec cannot parse."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2 or w.getnchannels() != 1:
                raise NotImplementedError(
                    "only mono 16-bit PCM WAV is handled without an "
                    "external audio library"
                )
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    # wave surfaces truncated/garbled input as EOFError or struct
    # errors, not just wave.Error — fold them all into the contract
    # (property-tested in tests/test_codec_property.py)
    except (wave.Error, EOFError, struct.error) as e:
        raise NotImplementedError(f"not a PCM WAV stream ({e})") from e
    return rate, list(struct.unpack(f"<{len(raw) // 2}h", raw))


def decode_wav_np(data: bytes):
    """(frame_rate, int64 numpy array) — the same stdlib ``wave``
    header parse and error contract as :func:`decode_wav`, with
    vectorized sample extraction (``np.frombuffer`` on the PCM block
    instead of per-sample ``struct.unpack``) for Arrow hot paths that
    immediately reduce with numpy anyway."""
    import numpy as np

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2 or w.getnchannels() != 1:
                raise NotImplementedError(
                    "only mono 16-bit PCM WAV is handled without an "
                    "external audio library"
                )
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise NotImplementedError(f"not a PCM WAV stream ({e})") from e
    return rate, np.frombuffer(raw, dtype="<i2").astype(np.int64)


_AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def extract_audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    target_partition_bytes: int = 128 * 1024 * 1024,
    total_bytes: int | None = None,
) -> DataFrame:
    """Decode WAV payloads and emit the loudness/shape features a
    training-data audio pipeline filters on: frame count, duration,
    peak amplitude, RMS (rounded to 4dp), and zero-crossing count (the
    cheap pitch-content proxy).

    Same scale shape as the image tier: byte-budget repartition before
    the Arrow stage so one partition's audio fits executor memory, and
    the output is 6 small columns — payloads never shuffle past the
    decode.  Pass ``total_bytes`` when payload sizes are known
    upstream (a manifest, fixed-rate renders): the fallback sizing
    aggregate executes the upstream plan an extra time, which doubles
    the work when that upstream is itself a synthesis/transcode
    stage."""
    import math

    import pandas as pd

    from beehive_spark.functions.multimodal import byte_budget_partitions

    n_parts = byte_budget_partitions(
        media, target_partition_bytes, total_bytes, payload_col=payload_col
    )
    repart = media.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(payload_col).alias("p")
    ).repartition(n_parts, "media_id")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "n_frames", "duration_ms", "peak", "rms",
                    "zero_crossings")}
            for media_id, payload in zip(pdf["media_id"], pdf["p"]):
                # vectorized reductions over the int64 sample array:
                # integer sums/extrema are exact, so peak/rms/zc are
                # bit-identical to the per-sample Python fold they
                # replace (the media_audio_vad r9 attribution applied
                # to this stage; same ~8x constant)
                rate, samples = decode_wav_np(bytes(payload))
                n = len(samples)
                neg = samples < 0
                zc = int(np.count_nonzero(neg[1:] != neg[:-1])) if n else 0
                out["media_id"].append(media_id)
                out["n_frames"].append(n)
                out["duration_ms"].append(round(n * 1000 / rate))
                out["peak"].append(
                    int(np.abs(samples).max()) if n else 0
                )
                out["rms"].append(
                    round(
                        math.sqrt(
                            int(np.sum(samples * samples, dtype=np.int64)) / n
                        ),
                        4,
                    )
                    if n
                    else 0.0
                )
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    return repart.mapInPandas(run, schema=_AUDIO_FEATURE_SCHEMA)
