"""ExactSubstr dedup (Lee et al. 2022 semantics at character grain):
window ranking keeps the globally-first occurrence, maximal-span
merging, segment-cut reassembly, and the hash-keyed scale path."""

import pytest

from gfw_raster_analysis_lambda_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _clean(spark, rows, min_len, **kw):
    out = T.exact_substring_dedup(_docs(spark, rows), min_len=min_len, **kw)
    return {r.doc_id: r for r in out.collect()}


def test_first_occurrence_survives_later_copies_cut(spark):
    # distinct chars around the boiler so no window crosses the boundary
    # identically in two docs (boundary-sharing EXTENDS spans — that is
    # correct ExactSubstr behavior, tested separately below)
    boiler = "X" * 7 + "abcdefghij" * 4  # 47 chars, window L=40 repeats
    rows = [(0, "prefix0&" + boiler + "%tail0"),
            (1, "p1=" + boiler + "_t1"),
            (2, boiler)]
    got = _clean(spark, rows, 40)
    assert got[0].text_clean == rows[0][1]          # first occurrence intact
    assert got[0].removed_chars == 0
    assert got[1].removed_chars == 47 and got[2].removed_chars == 47
    # every 40-window of the boiler is duplicated; doc2 IS the boiler
    assert got[2].text_clean == ""
    assert got[2].n_spans == 1
    # doc1 keeps its unique prefix/suffix, loses exactly the boiler
    assert got[1].text_clean == "p1=" + "_t1"


def test_shared_boundary_context_extends_the_span(spark):
    # when two docs share the char AFTER the duplicated block too, the
    # duplicated window set extends across that boundary and the cut
    # takes the shared context with it — the Lee et al. contract
    # (duplicated means duplicated, including shared boundary bytes)
    boiler = "X" * 7 + "abcdefghij" * 4  # 47 chars, no internal repeats
    rows = [(0, "prefix0 " + boiler + " tail0"),
            (1, "p1 " + boiler + " t1")]
    got = _clean(spark, rows, 40)
    # " " + boiler + " t" is common to both docs -> doc1's span covers it
    assert got[1].text_clean == "p1" + "1"
    assert got[0].removed_chars == 0


def test_short_docs_and_unique_docs_pass_through(spark):
    import string
    rows = [(0, "tiny"), (1, "u" * 39),
            (2, "unique-" + string.ascii_letters)]  # 59 chars, no repeats
    got = _clean(spark, rows, 40)
    for d, t in rows:
        assert got[d].text_clean == t
        assert got[d].removed_chars == 0 and got[d].n_spans == 0


def test_gap_keeps_two_spans_adjacency_merges_one(spark):
    import string
    a = string.ascii_lowercase + string.digits + "ABCDEFGHI"  # 45, no repeats
    b = a[::-1]
    rows = [(0, a + "-sep-" + b),   # first occurrence of both blocks
            (1, a + "=gap=" + b),   # 5 unique chars between -> 2 spans
            (2, a + b)]             # adjacent coverage -> 1 span, all cut
    got = _clean(spark, rows, 40)
    assert got[0].removed_chars == 0
    assert got[1].n_spans == 2
    assert got[1].text_clean == "=gap="
    assert got[2].n_spans == 1
    assert got[2].text_clean == ""


def test_within_doc_repetition_is_cut(spark):
    rows = [(0, "Z" * 100)]
    got = _clean(spark, rows, 40)
    # windows 2..61 duplicate window 1; one span [2, 101) remains
    assert got[0].n_spans == 1
    assert got[0].removed_chars == 99
    assert got[0].text_clean == "Z"


def test_hash_keyed_path_matches_raw(spark):
    rows = [(i, f"doc{i} " + ("common payload piece! " * 3) + f"tail{i%3}")
            for i in range(12)]
    raw = _clean(spark, rows, 40, key_on_hash=False)
    hsh = _clean(spark, rows, 40, key_on_hash=True)
    for d in raw:
        assert raw[d].text_clean == hsh[d].text_clean
        assert raw[d].n_spans == hsh[d].n_spans


def test_spans_frame_shape(spark):
    rows = [(0, "W" * 80), (1, "W" * 80)]
    spans = T.exact_substring_spans(_docs(spark, rows), min_len=40).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    # doc0 pos 2..41 removable (self-rep) -> [2,81); doc1 all pos 1..41 -> [1,81)
    assert got == {(0, 2, 81), (1, 1, 81)}


def test_min_len_guard(spark):
    with pytest.raises(ValueError):
        T.exact_substring_spans(_docs(spark, [(0, "x")]), min_len=1)
