"""Property test: triangle_counts equals neighbor-set-intersection
brute force on ANY random graph, for BOTH execution strategies.

Hypothesis generates arbitrary small edge multisets (duplicates,
self-loops, reversed pairs included — the operator canonicalizes);
catches orientation/total-order bugs (double-counted or missed
triangles) that crafted examples can miss.  Example count is small
because each case runs real Spark jobs.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from beehive_spark.operators.graph import triangle_counts


def _brute(edges):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for u in sorted(adj):
        for v in sorted(adj[u]):
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    for x in (u, v, w):
                        counts[x] = counts.get(x, 0) + 1
    return counts


edge = st.tuples(
    st.integers(min_value=0, max_value=14),
    st.integers(min_value=0, max_value=14),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(edge, min_size=1, max_size=40))
def test_triangles_match_brute_force_any_graph(spark, edges):
    # operator contract: canonical u < v rows (self-loops filtered
    # internally); canonicalize the raw pairs, keep duplicates
    canon = [(min(u, v), max(u, v)) for u, v in edges]
    df = spark.createDataFrame(canon, ["u", "v"])
    want = _brute(edges)
    for bcast in (True, False):
        got = {
            r["id"]: r["triangles"]
            for r in triangle_counts(df, broadcast_adjacency=bcast).collect()
        }
        assert got == want, f"broadcast_adjacency={bcast}"
