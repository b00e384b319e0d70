"""DSIR importance resampling: weight direction, scoring determinism,
and model shape."""

from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.operators.text import (
    dsir_scores,
    dsir_weights,
)


def _corpus(spark):
    # target-flavored docs talk about telescopes; pile docs about sports
    rows = []
    for i in range(30):
        rows.append((i, "telescope optics mirror aperture telescope lens", "tgt"))
    for i in range(30, 90):
        rows.append((i, "football score goal match referee stadium crowd", "pile"))
    for i in range(90, 100):
        rows.append((i, "telescope aperture observation nebula", "pile"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_target_like_docs_score_higher(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("source") == "tgt")
    w = dsir_weights(docs, target, n_buckets=512)
    s = {r.doc_id: r.score_micro for r in
         dsir_scores(docs, w, n_buckets=512).collect()}
    # telescope-flavored pile docs (90..99) outscore every sports doc
    worst_target_like = min(s[i] for i in range(90, 100))
    best_sports = max(s[i] for i in range(30, 90))
    assert worst_target_like > best_sports
    # and the actual target docs score highest of all
    assert min(s[i] for i in range(30)) > worst_target_like


def test_scores_partition_invariant(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("source") == "tgt")
    w = dsir_weights(docs, target, n_buckets=512)
    a = sorted(dsir_scores(docs, w, n_buckets=512).collect())
    b = sorted(dsir_scores(docs.repartition(17), w, n_buckets=512).collect())
    assert a == b


def test_weight_table_is_bounded_by_buckets(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("source") == "tgt")
    w = dsir_weights(docs, target, n_buckets=64)
    assert w.count() <= 64
    # weights must carry both signs on this polarized corpus
    signs = {r.w_micro > 0 for r in w.collect()}
    assert signs == {True, False}


def test_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "shared words here", "t"), (1, "", "p"), (2, "shared words here", "p")],
        "doc_id long, text string, source string",
    )
    target = docs.filter(F.col("source") == "t")
    w = dsir_weights(docs, target, n_buckets=64)
    got = {r.doc_id: r for r in dsir_scores(docs, w, n_buckets=64).collect()}
    assert got[1].n_feats == 0 and got[1].score_micro == 0
