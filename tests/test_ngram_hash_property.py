"""Property test: the direct tuple-hash n-gram path must preserve the
set semantics of the string-shingle path it replaced.

`_ngram_hashes(w, n)` hashes token n-grams straight from the token
slots; `_shingles(w, n)` builds "a b c" strings.  The dedup operators
only ever consume DISTINCTNESS of shingles (set sizes, intersections,
minima), so the property that matters is: for any token list, distinct
tuple-hash count == distinct string-shingle count (i.e. tuple hashing
introduces neither merges nor splits of the shingle set), including
boundary sizes (len < n, exactly n, repeated tokens, empty strings).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from beehive_spark.queries.llm import _ngram_hashes, _shingles

# tokens come from TOKEN_RE ([a-z0-9]+) and can never contain the
# shingle separator; a space-bearing alphabet would test an input the
# operators cannot see AND hit concat ambiguity ("a b"+"c" vs "a"+"b c")
# where the two paths legitimately differ
_token = st.text(alphabet="ab1", min_size=1, max_size=3)
_words = st.lists(_token, min_size=0, max_size=12)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(words=_words)
def test_tuple_hash_distinctness_matches_string_shingles(spark, words):
    df = spark.createDataFrame([(words,)], "w array<string>")
    row = df.select(
        F.size(_ngram_hashes(F.col("w"))).alias("nh"),
        F.size(_shingles(F.col("w"))).alias("ns"),
    ).collect()[0]
    assert row["nh"] == row["ns"], (words, row)
