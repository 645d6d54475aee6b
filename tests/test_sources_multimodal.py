"""Tests for sources/sinks and multimodal plumbing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from beehive_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    wrap_as_media,
)
from beehive_spark.sources import (
    build_upsert_sql,
    read_table,
    table_exists,
    upsert_partition,
)


def test_read_table_parquet_with_predicate(spark, sf_dir):
    df = read_table(spark, sf_dir, "nation", predicate="n_regionkey = 2")
    assert df.count() == 5
    assert all(r["n_regionkey"] == 2 for r in df.collect())


def test_table_exists_parquet(spark, sf_dir):
    assert table_exists(spark, sf_dir, "orders")
    assert not table_exists(spark, sf_dir, "gaac")


def test_build_upsert_sql():
    sql = build_upsert_sql("person", ["person_id", "changed_by"], ["changed_by"])
    assert sql == (
        "INSERT INTO person (person_id, changed_by) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE changed_by = VALUES(changed_by)"
    )
    with pytest.raises(ValueError):
        build_upsert_sql("t", ["a"], [])


class FakeCursor:
    def __init__(self, log):
        self.log = log

    def executemany(self, sql, rows):
        self.log.append((sql, list(rows)))


class FakeConn:
    def __init__(self, log):
        self.log = log
        self.committed = False
        self.closed = False

    def cursor(self):
        return FakeCursor(self.log)

    def commit(self):
        self.log.append(("COMMIT", None))

    def close(self):
        self.closed = True


def test_upsert_partition_batches_and_commits():
    log = []
    rows = [{"a": i, "b": i * 10} for i in range(5)]
    n = upsert_partition(
        iter(rows), "SQL", ["a", "b"], lambda: FakeConn(log), batch_size=2
    )
    assert n == 5
    batches = [r for sql, r in log if sql == "SQL"]
    assert [len(b) for b in batches] == [2, 2, 1]
    assert batches[0] == [(0, 0), (1, 10)]
    assert log[-1][0] == "COMMIT"


def test_multimodal_feature_extraction(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = wrap_as_media(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    # deterministic digest/feature must equal a local recomputation
    sample = docs.limit(1).collect()[0]
    local = sample["text"].encode()
    r = rows[sample["doc_id"]]
    assert r["digest"] == hashlib.sha256(local).hexdigest()
    assert r["n_bytes"] == len(local)
    assert len(r["feature"]) == FEATURE_DIM
    dg = hashlib.sha256(local).digest()
    assert abs(r["feature"][0] - dg[0] / 255.0) < 1e-6


def test_multimodal_real_decoder_stubbed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    media = wrap_as_media(docs, "doc_id", "text")
    with pytest.raises(Exception) as ei:
        extract_features(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(ei.value) or "media decoding" in str(ei.value)


def test_resize_images_rewrites_dims_and_composes(spark, sf_dir):
    from beehive_spark.functions.multimodal import resize_images, wrap_as_media
    from beehive_spark.queries import load

    docs = load(spark, sf_dir, "documents").limit(20)
    media = wrap_as_media(docs, "doc_id", "text")
    out = resize_images(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["content"]) == 8 * 4
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
    # same schema in as out -> stages chain
    again = resize_images(out, width=2, height=2).collect()
    assert all(len(r["content"]) == 4 for r in again)
    # deterministic across runs
    assert rows[0]["content"] == resize_images(media, 8, 4).collect()[0]["content"]


def test_sample_frames_fans_out_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from beehive_spark.functions.multimodal import sample_frames, wrap_as_media
    from beehive_spark.queries import load

    docs = load(spark, sf_dir, "documents").limit(5)
    media = wrap_as_media(docs, "doc_id", "text", modality="video")
    # give each video a duration so the stride produces multiple frames
    media = media.withColumn(
        "meta",
        F.col("meta").withField("duration_ms", F.lit(3500).cast("long")),
    )
    frames = sample_frames(media, every_ms=1000, max_frames=3)
    rows = frames.collect()
    # duration 3500ms / 1000ms stride -> 4 frames, capped at 3
    assert len(rows) == 5 * 3
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
        assert len(r["frame"]) == 32  # sha256 fake frame
    for v in per.values():
        assert sorted(v) == [(0, 0), (1, 1000), (2, 2000)]


# -- real codec tier ----------------------------------------------------
# Pillow when installed, the vendored pure-Python PNG codec otherwise
# (functions/png.py) — the real-pixel path runs EITHER WAY; only
# non-PNG formats without Pillow raise.

def _png_bytes(w, h, value=None, seed=0):
    import numpy as np

    from beehive_spark.functions.png import encode_png

    if value is not None:
        px = np.full((h, w, 3), value, dtype=np.uint8)
    else:
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
    return encode_png(px)


def test_non_png_without_pillow_raises_cleanly():
    from beehive_spark.functions import multimodal as mm

    if mm.HAS_PIL:
        pytest.skip("Pillow installed - it may handle arbitrary formats")
    with pytest.raises(NotImplementedError, match="PNG"):
        mm._decode_real(b"\x00not-an-image", None)
    with pytest.raises(NotImplementedError, match="PNG"):
        mm._resize_real(b"\x00not-an-image", 2, 2)


def test_real_decoder_roundtrip_on_png(spark):
    """The use_real_decoder=True path decodes REAL compressed pixels in
    every environment (vendored codec here; Pillow-backed elsewhere)."""
    df = spark.createDataFrame(
        [(1, _png_bytes(6, 3, value=17))], "media_id long, payload binary"
    )
    media = wrap_as_media(df, "media_id", "payload")
    resized = resize_images(media, 4, 2, use_real_decoder=True).collect()
    assert resized[0]["content"] == bytes([17]) * (4 * 2 * 3)  # true resample
    feats = extract_features(media, use_real_decoder=True).collect()
    assert feats[0]["n_bytes"] == 6 * 3 * 3  # decoded raw RGB length


def test_real_ahash_invariance_and_discrimination(spark):
    """Real-pixel average hash: byte-identical images collide exactly;
    a constant brightness shift leaves the hash unchanged (ahash
    thresholds against the image's own mean); independent noise images
    sit far apart."""
    import numpy as np

    from beehive_spark.functions.multimodal import perceptual_hash
    from beehive_spark.functions.png import encode_png

    rng = np.random.default_rng(3)
    base = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (1, encode_png(base)),
        (2, encode_png(base)),                      # identical copy
        (3, encode_png((base + 20).astype("uint8"))),  # uniform brightening
        (4, _png_bytes(16, 16, seed=99)),            # unrelated noise
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = wrap_as_media(df, "media_id", "payload")
    h = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(media, use_real_decoder=True).collect()
    }
    assert h[1] == h[2]
    assert h[1] == h[3]  # mean-relative threshold: shift-invariant
    assert bin((h[1] ^ h[4]) & ((1 << 64) - 1)).count("1") > 10


def test_registered_media_query_finds_exactly_planted_pairs(spark, sf_dir):
    from beehive_spark.queries import all_queries, load

    res = all_queries()["media_phash_dedup"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    want = sorted(
        (r["doc_id"], r["doc_id"] + 1_000_000, 0)
        for r in docs.filter(F.col("doc_id") % 5 == 0).collect()
    )
    assert sorted((r["id_i"], r["id_j"], r["hamming"]) for r in res) == want


def test_phash_dedup_finds_identical_payloads(spark, sf_dir):
    """Identical payloads must pair at hamming 0 through the block-LSH
    join; distinct payloads (avalanche-hashed) must not pair."""
    from beehive_spark.functions.multimodal import (
        perceptual_hash,
        phash_dedup,
        wrap_as_media,
    )
    from beehive_spark.queries import load

    docs = load(spark, sf_dir, "documents").limit(40)
    # duplicate payloads under shifted ids: 1000+i carries doc i's bytes
    dup = docs.selectExpr("doc_id + 1000 AS doc_id", "text")
    media = wrap_as_media(docs.select("doc_id", "text").unionByName(dup),
                          "doc_id", "text")
    pairs = phash_dedup(perceptual_hash(media)).collect()
    exact = {(r["id_i"], r["id_j"]) for r in pairs if r["hamming"] == 0}
    # every planted (i, i+1000) pair found...
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    planted = {(i, i + 1000) for i in ids}
    assert planted <= exact
    # ...and nothing at 1 <= hamming <= 3 (sha256 stand-in scatters)
    assert all(r["hamming"] == 0 for r in pairs)


def test_wav_codec_roundtrip_and_rejection():
    from beehive_spark.functions.audio import decode_wav, encode_wav

    samples = [0, 1000, -1000, 32767, -32768, 5]
    rate, back = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000 and back == samples
    # clamping
    _, clamped = decode_wav(encode_wav([99999, -99999]))
    assert clamped == [32767, -32768]
    with pytest.raises(NotImplementedError):
        decode_wav(b"not audio at all")


def test_registered_audio_query_closed_form(spark, sf_dir):
    from beehive_spark.queries import all_queries, load

    res = {r["media_id"]: r for r in
           all_queries()["media_audio_features"](spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents")
    assert len(res) == docs.count()
    for doc_id, r in list(res.items())[:20]:
        n = 800 + (doc_id % 100) * 16
        a = 1000 + (doc_id % 50) * 100
        assert r["n_frames"] == n
        assert r["duration_ms"] == n // 16
        assert r["peak"] == a and r["rms"] == float(a)
        assert r["zero_crossings"] == n // 8 - 1


def test_mpng_container_and_real_frame_sampling(spark):
    import numpy as np

    from beehive_spark.functions.multimodal import (
        decode_mpng,
        encode_mpng,
        sample_frames,
    )
    from beehive_spark.functions.png import encode_png

    frames = [encode_png(np.full((4, 4, 3), v, dtype=np.uint8)) for v in (9, 99, 199)]
    assert decode_mpng(encode_mpng(frames)) == frames
    with pytest.raises(NotImplementedError):
        decode_mpng(b"RIFFnot-a-container")

    df = spark.createDataFrame(
        [(1, encode_mpng(frames))], "media_id long, payload binary"
    )
    media = wrap_as_media(df, "media_id", "payload", modality="video").withColumn(
        "meta", F.col("meta").withField("duration_ms", F.lit(5000).cast("long"))
    )
    out = sample_frames(media, every_ms=1000, max_frames=5, use_real_decoder=True)
    rows = sorted((r["frame_idx"], r["ts_ms"], bytes(r["frame"])) for r in out.collect())
    # 5 samples over the 5s duration; each TIME maps to the nearest of
    # the 3 real frames (spanning [0, 5000] -> interval 2500ms):
    # ts 0,1000 -> frame 0; 2000,3000 -> frame 1; 4000 -> frame 2
    assert [(i, ts) for i, ts, _ in rows] == [
        (0, 0), (1, 1000), (2, 2000), (3, 3000), (4, 4000)
    ]
    for (_, _, payload), v in zip(rows, (9, 9, 99, 99, 199)):
        assert payload == bytes([v]) * (4 * 4 * 3)


def test_mpng_truncation_raises_contract_error():
    import numpy as np

    from beehive_spark.functions.multimodal import decode_mpng, encode_mpng
    from beehive_spark.functions.png import encode_png

    good = encode_mpng(
        [encode_png(np.full((3, 3, 3), v, dtype=np.uint8)) for v in (1, 2)]
    )
    # every truncation point must raise the contract error, never
    # struct.error and never a silently-short frame
    for cut in (5, 7, 10, len(good) // 2, len(good) - 1):
        with pytest.raises(NotImplementedError, match="MPNG"):
            decode_mpng(good[:cut])
