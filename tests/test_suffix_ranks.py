"""Prefix-doubling suffix ranks + the distributed dense-rank primitive."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.functions.ranking import (
    distributed_dense_rank,
)
from gfw_raster_analysis_lambda_spark.operators.text import suffix_ranks


def _oracle(docs, p):
    sufs = sorted(
        {(d, i + 1): t[i : i + p] for d, t in docs for i in range(len(t))}.items(),
        key=lambda kv: kv[1],
    )
    rank, prev, exp = 0, None, {}
    for k, s in sufs:
        if s != prev:
            rank += 1
            prev = s
        exp[k] = rank
    return exp


def test_suffix_ranks_match_bruteforce(spark):
    docs = [(0, "banana"), (1, "bandana"), (2, "an"), (3, ""), (4, "banana")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.pos): r.rank
           for r in suffix_ranks(df, max_prefix=8).collect()}
    assert got == _oracle(docs, 8)


def test_cap_truncates_comparison(spark):
    # differ only after the cap -> identical ranks at max_prefix=4
    docs = [(0, "abcdX"), (1, "abcdY")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.pos): r.rank
           for r in suffix_ranks(df, max_prefix=4).collect()}
    assert got == _oracle(docs, 4)
    assert got[(0, 1)] == got[(1, 1)]   # 'abcd' == 'abcd' under the cap


def test_early_exit_is_lossless(spark):
    # all suffixes distinct after 2 chars: early exit must equal full run
    docs = [(0, "abcdefgh"), (1, "ponmlqrs")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.pos): r.rank
           for r in suffix_ranks(df, max_prefix=64).collect()}
    assert got == _oracle(docs, 64)


def test_power_of_two_guard(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        suffix_ranks(df, max_prefix=48)


def test_distributed_dense_rank_matches_window(spark):
    rows = [(i % 7, (i * 13) % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = distributed_dense_rank(df, ["a", "b"], out="r")
    w = Window.orderBy("a", "b")
    exp = df.withColumn("r", F.dense_rank().over(w).cast("long"))
    assert (
        got.groupBy("a", "b", "r").count().orderBy("a", "b").collect()
        == exp.groupBy("a", "b", "r").count().orderBy("a", "b").collect()
    )


def test_distributed_dense_rank_rejects_nulls(spark):
    df = spark.createDataFrame([(1,), (None,)], "a int")
    with pytest.raises(ValueError):
        distributed_dense_rank(df, ["a"])


def test_repeated_substring_stats_bruteforce(spark):
    from gfw_raster_analysis_lambda_spark.operators.text import (
        repeated_substring_stats,
    )

    docs = [(0, "banana"), (1, "bandana"), (2, "an"), (3, ""), (4, "banana"),
            (5, "xyzzyxy"), (6, "the quick brown fox the quick brown cat")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    P, L = 8, 4
    got = {r.doc_id: (r.max_rep, r.n_rep)
           for r in repeated_substring_stats(df, max_prefix=P, min_len=L).collect()}
    sufs = [(d, i + 1, t[i:i + P]) for d, t in docs for i in range(len(t))]

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    import collections
    per_doc = collections.defaultdict(list)
    for k, (d, pos, g) in enumerate(sufs):
        best = 0
        for k2, (d2, pos2, g2) in enumerate(sufs):
            if k2 != k:
                best = max(best, len(g) if g == g2 else lcp(g, g2))
        per_doc[d].append(best)
    exp = {}
    for d, t in docs:
        vals = per_doc.get(d, [])
        exp[d] = (max(vals) if vals else 0, sum(1 for v in vals if v >= L))
    assert got == exp


def test_repeated_substring_links_to_exact_substr(spark):
    # a doc has a >=L duplicated span exactly when max_rep >= L
    from gfw_raster_analysis_lambda_spark.operators.text import (
        exact_substring_dedup,
        repeated_substring_stats,
    )

    import string
    uniq = string.ascii_letters + string.digits  # 62 chars, no repeats
    boiler = "SHARED-BOILERPLATE-" * 3           # 57 chars
    docs = [(0, uniq), (1, boiler + uniq[:10]), (2, boiler + uniq[10:20])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rep = {r.doc_id: r.max_rep
           for r in repeated_substring_stats(df, max_prefix=64, min_len=40).collect()}
    cut = {r.doc_id: r.removed_chars
           for r in exact_substring_dedup(df, min_len=40).collect()}
    for d in (0, 1, 2):
        assert (rep[d] >= 40) == (cut[d] > 0 or (d == 1 and cut[d] == 0))
    # doc1 holds the FIRST occurrence (kept), doc2's copy is cut
    assert cut[1] == 0 and cut[2] > 0 and rep[1] >= 40 and rep[2] >= 40
    assert rep[0] < 40 and cut[0] == 0
