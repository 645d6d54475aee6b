"""Round-7 additions: planted PageRank twin (and siblings as they land).

Each driver-gated query gets an in-test pin against an INDEPENDENT
brute-force twin on the real sf0.001 data — here a full |V|-dimensional
python power iteration, NOT the two-scalar symmetry collapse the oracle
uses, so a symmetry-breaking bug in the plant itself would also show."""

from pyspark.sql import functions as F


def _brute_pagerank_star_forest(n: int, iters: int, damping: float = 0.85):
    """Dense per-node power iteration over the planted star forest,
    replicating the operator's no_dangling update order exactly:
    r' = (1-d)/n + d * sum(in-contribs)."""
    out_deg = [14 if i % 15 == 0 else 1 for i in range(n)]
    ranks = [1.0 / n] * n
    for _ in range(iters):
        contrib = [0.0] * n
        for i in range(n):
            hub = (i // 15) * 15
            if i == hub:
                continue
            # leaf -> hub and hub -> leaf
            contrib[hub] += ranks[i] / out_deg[i]
            contrib[i] += ranks[hub] / out_deg[hub]
        ranks = [
            (1.0 - damping) / n + damping * contrib[i] for i in range(n)
        ]
    return ranks


def test_pagerank_planted_matches_dense_power_iteration(spark, sf_dir):
    from beehive_spark.queries.relational import (
        _PR_PLANTED_ITERS,
        pagerank_planted,
    )

    got = {
        (r["id"], r["rank_nano"])
        for r in pagerank_planted(spark, sf_dir).collect()
    }
    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert n % 15 == 0 and n > 0
    ranks = _brute_pagerank_star_forest(n, _PR_PLANTED_ITERS)
    # the dense twin and the operator disagree only at fl-sum ulp
    # scale, ~9 orders below the nano grid — exact match expected
    want = {(i, round(ranks[i] * 1e9)) for i in range(n)}
    assert got == want and got
    # ranks form a probability distribution (mass conservation is the
    # property the planted oracle is designed to catch violations of)
    total = sum(ranks)
    assert abs(total - 1.0) < 1e-9
    # non-uniform by construction: hub mass well above leaf mass
    hubs = {v for i, v in want if i % 15 == 0}
    leaves = {v for i, v in want if i % 15 != 0}
    assert min(hubs) > 5 * max(leaves)


# ---------------------------------------------------------------------------
# Cross-modal join: python-decode twin + fake-tier plumbing
# ---------------------------------------------------------------------------
def test_media_caption_luma_matches_python_join(spark, sf_dir):
    from beehive_spark.queries.media import media_caption_luma

    got = {
        (r["luma_bucket"], r["source"]): (
            r["n_docs"], r["total_chars"], r["luma_char_moment"]
        )
        for r in media_caption_luma(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.length("text").alias("chars")
    ).collect()
    want = {}
    for r in docs:
        v = (r["doc_id"] * 37) % 251
        key = (v // 32, r["source"])
        n, c, m = want.get(key, (0, 0, 0))
        want[key] = (n + 1, c + r["chars"], m + v * r["chars"])
    assert got == want and got


def test_media_caption_luma_decode_really_runs(spark, sf_dir):
    """The real decode path is load-bearing: decode a few synthesized
    payloads with the vendored codec in plain python and check the
    pixel mean equals the planted closed form."""
    from beehive_spark.functions.png import decode_png
    from beehive_spark.queries.media import synth_solid_png_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    rows = synth_solid_png_media(docs).collect()
    assert rows
    for r in rows:
        px = decode_png(bytes(r["payload"]))
        assert px.shape == (16, 16, 3)
        v = (r["media_id"] * 37) % 251
        assert int(px.sum()) // px.size == v
        assert (px == v).all()


def test_image_stats_fake_tier_reduces_raw_bytes(spark):
    from beehive_spark.functions.multimodal import image_stats, wrap_as_media

    df = spark.createDataFrame(
        [(1, bytes([10, 20, 30])), (2, b""), (3, bytes([255]))],
        "media_id long, payload binary",
    )
    media = wrap_as_media(df, "media_id", "payload")
    got = {
        r["media_id"]: (r["mean_byte"], r["n_pixel_bytes"])
        for r in image_stats(media).collect()
    }
    assert got == {1: (20, 3), 2: (None, 0), 3: (255, 1)}
