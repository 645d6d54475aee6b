"""Round-8 additions, batch 9: RAKE keyphrases and Pareto ABC —
python twins built from scratch off the parquet."""

import pytest

pytestmark = pytest.mark.slow  # query pins duplicated by the oracle gate

import math
import re

import duckdb

_TOKEN = re.compile(r"[a-z0-9]+")
_STOPS = {"a", "the", "and", "of", "to", "in", "is", "on"}


def test_text_keyphrases_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.llm import text_keyphrases

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    instances = []  # list of tuples(phrase words)
    for _, text in docs:
        run = []
        for w in _TOKEN.findall(text.lower()) + ["the"]:  # sentinel flush
            if w in _STOPS:
                if run and len(run) <= 4:
                    instances.append(tuple(run))
                run = []
            else:
                run.append(w)
    freq, deg = {}, {}
    for p in instances:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p) - 1
    ws = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
    agg = {}
    for p in instances:
        s = sum(ws[w] for w in p)
        n, _ = agg.get(p, (0, s))
        agg[p] = (n + 1, s)
    ranked = sorted(
        ((" ".join(p), n, s) for p, (n, s) in agg.items()),
        key=lambda t: (-t[2], t[0]),
    )[:30]
    want = {p: (n, s) for p, n, s in ranked}
    got = {
        r["phrase"]: (r["n_occurrences"], r["score_micro"])
        for r in text_keyphrases(spark, sf_dir).collect()
    }
    assert got == want


def test_pareto_abc_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.core import orders_pareto_abc

    rows = duckdb.sql(
        f"SELECT o_custkey, o_totalprice FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    rev = {}
    for c, tp in rows:
        cents = int(math.copysign(math.floor(abs(tp * 100) + 0.5), tp))
        rev[c] = rev.get(c, 0) + cents
    total = sum(rev.values())
    cum = 0
    want = {}
    for c, cents in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += cents
        cls = "A" if cum * 100 <= total * 80 else (
            "B" if cum * 100 <= total * 95 else "C"
        )
        n, s = want.get(cls, (0, 0))
        want[cls] = (n + 1, s + cents)
    got = {
        r["abc_class"]: (r["n_customers"], r["cents"])
        for r in orders_pareto_abc(spark, sf_dir).collect()
    }
    assert got == want
    # Pareto sanity: the A class is a minority of customers holding
    # the large-majority revenue share
    n_total = sum(v[0] for v in got.values())
    assert got["A"][0] < n_total
    assert got["A"][1] * 100 <= total * 80


def test_exact_quantiles_match_full_sort_twin(spark, sf_dir):
    from beehive_spark.queries.core import lineitem_exact_quantiles

    vals = sorted(
        int(math.copysign(math.floor(abs(v * 100) + 0.5), v))
        for (v,) in duckdb.sql(
            f"SELECT l_extendedprice FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
    )
    n = len(vals)
    want = {
        "p25": (n, (n + 3) // 4, vals[(n + 3) // 4 - 1]),
        "p50": (n, (n + 1) // 2, vals[(n + 1) // 2 - 1]),
        "p75": (n, (3 * n + 3) // 4, vals[(3 * n + 3) // 4 - 1]),
    }
    got = {
        r["quantile"]: (r["n_rows"], r["rank"], r["value_cents"])
        for r in lineitem_exact_quantiles(spark, sf_dir).collect()
    }
    assert got == want


def test_exact_quantiles_selection_is_bucket_exact_at_tiny_bucket_count(
    spark, sf_dir
):
    """With n_buckets=2 the bands are huge and the refinement pass does
    almost all the work — the selection must stay exact (guards the
    prefix arithmetic at the bucket boundary)."""
    from beehive_spark.queries.core import lineitem_exact_quantiles

    a = {
        r["quantile"]: r["value_cents"]
        for r in lineitem_exact_quantiles(spark, sf_dir).collect()
    }
    b = {
        r["quantile"]: r["value_cents"]
        for r in lineitem_exact_quantiles(spark, sf_dir, n_buckets=2).collect()
    }
    assert a == b


def test_mixture_temperature_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.curation import mixture_temperature_schedule

    rows = duckdb.sql(
        f"SELECT source, COUNT(*), SUM(n_chars) "
        f"FROM '{sf_dir}/documents.parquet' GROUP BY source"
    ).fetchall()
    p = {
        src: (nd, nc, int(math.floor(abs((nc ** 0.7) * 1e6) + 0.5)))
        for src, nd, nc in rows
    }
    total = sum(v[2] for v in p.values())
    want = {}
    for src, (nd, nc, pm) in p.items():
        w = (pm * 1_000_000) // total
        quota = (w * 1_000_000_000) // 1_000_000
        want[src] = (nd, nc, w, quota, (quota * 1000) // nc)
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_chars"],
            r["weight_ppm"],
            r["quota_chars"],
            r["epochs_milli"],
        )
        for r in mixture_temperature_schedule(spark, sf_dir).collect()
    }
    assert got == want
    # temperature flattening: the smallest source's weight share must
    # exceed its natural char share (alpha < 1 up-samples the tail)
    nchars = {s: v[1] for s, v in want.items()}
    tot_c = sum(nchars.values())
    s_min = min(nchars, key=nchars.get)
    assert want[s_min][2] / 1e6 > nchars[s_min] / tot_c
