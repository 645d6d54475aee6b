"""BPE train/apply: hand-verified merges, encoder invariants, and the
distributed query's consistency with a driver-side re-encode."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beehive_spark.functions.bpe import make_encoder, train_bpe


def test_train_bpe_hand_example():
    # Sennrich-style toy: 'aaab' x5, 'aab' x2 -> ('a','a') dominates
    merges = train_bpe([("aaab", 5), ("aab", 2)], n_merges=2)
    assert merges[0] == ("a", "a")
    # after aa: aaab -> [aa,a,b] (x5 -> (aa,a)=5, (a,b)=7... wait
    # aab -> [aa,b]: (aa,b)=2; aaab: (aa,a)=5,(a,b)=5 -> (a,b)=7 total)
    assert merges[1] == ("a", "b")


def test_encoder_applies_lowest_rank_first():
    enc = make_encoder([("a", "b"), ("ab", "c")])
    assert enc("abc") == ("abc",)
    assert enc("cab") == ("c", "ab")
    assert enc("zzz") == ("z", "z", "z")  # no merge applies


def test_more_merges_never_increase_token_count():
    words = [("internationalization", 3), ("international", 5), ("nation", 9)]
    m_all = train_bpe(words, n_merges=30)
    for w, _ in words:
        prev = len(w)
        for k in range(0, len(m_all) + 1, 5):
            n = len(make_encoder(m_all[:k])(w))
            assert n <= prev
            prev = n


def test_bpe_encode_query_matches_driver_reencode(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.curation import bpe_encode
    from beehive_spark.queries.llm import _tokens
    from pyspark.sql import functions as F
    import re

    got = {r["doc_id"]: r for r in bpe_encode(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)

    # retrain identically driver-side and re-encode a sample
    wf = (
        load(spark, sf_dir, "documents")
        .select(F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .collect()
    )
    merges = train_bpe([(r["w"], r["c"]) for r in wf], n_merges=100)
    enc = make_encoder(merges)
    tok = re.compile("[a-z0-9]+")
    for row in docs[:25]:
        words = tok.findall(row["text"].lower())
        want = sum(len(enc(w)) for w in words)
        assert got[row["doc_id"]]["n_bpe_tokens"] == want
        assert got[row["doc_id"]]["n_words"] == len(words)
