"""Round-8 additions, batch 7: reciprocal rank fusion — python twin
built from scratch (own tokenizer, own BM25, own cosine), never
through the Spark helpers."""

import math
import re

import duckdb

_TOKEN = re.compile(r"[a-z0-9]+")
_TERMS = ("dup", "spark", "merge")


def _rrf_twin(sf_dir, k_list=25, k_out=10):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    toks = {d: _TOKEN.findall(t.lower()) for d, t in docs}
    n = len(docs)
    t_total = sum(len(v) for v in toks.values())
    tf = {}
    for d, ws in toks.items():
        for w in ws:
            if w in _TERMS:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {}
    for (_, w), _c in tf.items():
        df[w] = df.get(w, 0) + 1
    scores = {}
    for (d, w), c in tf.items():
        dl = len(toks[d])
        idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
        sat = (c * 2.2) / (c + 1.2 * (1.0 - 0.75 + 0.75 * ((dl * n) / t_total)))
        v = idf * sat * 1_000_000
        scores[d] = scores.get(d, 0) + int(
            math.copysign(math.floor(abs(v) + 0.5), v)
        )
    bm = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k_list]
    rank_s = {d: i + 1 for i, (d, _) in enumerate(bm)}

    emb = dict(
        duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    qe = [float(x) for x in emb[0]]
    qn = math.sqrt(sum(x * x for x in qe))
    sims = []
    for vid, e in emb.items():
        if vid == 0:
            continue
        ce = [float(x) for x in e]
        cn = math.sqrt(sum(x * x for x in ce))
        dot = 0.0
        for a, b in zip(qe, ce):
            dot += a * b
        sims.append((vid, dot / (qn * cn)))
    sims.sort(key=lambda t: (-t[1], t[0]))
    rank_d = {vid: i + 1 for i, (vid, _) in enumerate(sims[:k_list])}

    fused = {}
    for d in set(rank_s) | set(rank_d):
        c = 0
        if d in rank_s:
            c += 1_000_000 // (60 + rank_s[d])
        if d in rank_d:
            c += 1_000_000 // (60 + rank_d[d])
        fused[d] = (rank_s.get(d), rank_d.get(d), c)
    top = sorted(fused.items(), key=lambda kv: (-kv[1][2], kv[0]))[:k_out]
    return dict(top)


def test_rrf_fusion_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.llm import retrieval_rrf_fusion

    want = _rrf_twin(sf_dir)
    got = {
        r["doc_id"]: (r["rank_sparse"], r["rank_dense"], r["rrf_micro"])
        for r in retrieval_rrf_fusion(spark, sf_dir).collect()
    }
    assert got == want


def test_rrf_double_listed_beats_equal_single(spark, sf_dir):
    """RRF algebra property on the real output: any doc present in
    BOTH lists outscores any doc whose single rank is >= both of its
    ranks (1/(60+a) + 1/(60+b) > 1/(60+min(a,b)))."""
    from beehive_spark.queries.llm import retrieval_rrf_fusion

    rows = retrieval_rrf_fusion(spark, sf_dir).collect()
    both = [r for r in rows if r["rank_sparse"] and r["rank_dense"]]
    single = [
        r
        for r in rows
        if (r["rank_sparse"] is None) != (r["rank_dense"] is None)
    ]
    for b in both:
        for s in single:
            sr = s["rank_sparse"] or s["rank_dense"]
            if sr >= min(b["rank_sparse"], b["rank_dense"]):
                assert b["rrf_micro"] > s["rrf_micro"], (b, s)
