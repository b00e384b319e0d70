"""Event-stream operators: watermarked windowed aggregation and
applyInPandasWithState sessionization, both driven with availableNow
micro-batch waves and checked against batch oracles.

Watermark mechanics under test: Spark computes each micro-batch's
watermark from the PREVIOUS batch's max event time, so emission of the
final windows/sessions requires a later wave (sentinel rows with a
far-future timestamp, fake user/type filtered from the assertions)."""

import glob
import os

import pandas as pd
import pytest

from gfw_raster_analysis_lambda_spark.streaming.events import (
    sessionize_events,
    windowed_event_stats,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _events_pdf():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")[EVENTS_COLS]


def _write_wave(spark, stream_dir, pdf):
    os.makedirs(stream_dir, exist_ok=True)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(stream_dir)


def _sentinel(i, ts, user=-1):
    return pd.DataFrame(
        [(10_000_000 + i, ts, user, "__sentinel__", 0.0, "{}")],
        columns=EVENTS_COLS,
    )


@pytest.mark.slow
def test_windowed_event_stats_with_late_rows(spark, tmp_path):
    pdf = _events_pdf().sort_values("ts").reset_index(drop=True)
    # wave 1: all but 50 rows; wave 2: 50 LATE rows (earlier ts than wave
    # 1's max, still within the un-emitted tail) + a far-future sentinel
    late = pdf.iloc[-300:-250]
    wave1 = pdf.drop(late.index)
    stream_dir, out_dir = str(tmp_path / "ev"), str(tmp_path / "out")
    # late rows are ~8.5-10 days older than wave 1's max ts: a 12-day
    # watermark delay admits them; a short one would (correctly) drop them
    wm = "12 days"

    _write_wave(spark, stream_dir, wave1)
    windowed_event_stats(spark, stream_dir, out_dir, watermark=wm).awaitTermination(120)
    _write_wave(spark, stream_dir, pd.concat(
        [late, _sentinel(0, pdf["ts"].max() + pd.Timedelta(days=60))]
    ))
    windowed_event_stats(spark, stream_dir, out_dir, watermark=wm).awaitTermination(120)
    # one more wave so the watermark (lagging one batch) passes everything
    _write_wave(spark, stream_dir, _sentinel(1, pdf["ts"].max() + pd.Timedelta(days=120)))
    windowed_event_stats(spark, stream_dir, out_dir, watermark=wm).awaitTermination(120)

    got = (
        pd.concat([pd.read_parquet(f) for f in glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)])
        .query("event_type != '__sentinel__'")
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    exp = (
        pdf.assign(window_start=pdf["ts"].dt.floor("1D"))
        .groupby(["window_start", "event_type"], as_index=False)
        .agg(n=("value", "size"), value_sum=("value", "sum"))
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    exp["value_sum"] = exp["value_sum"].round(3)
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    pd.testing.assert_series_equal(
        got["value_sum"], exp["value_sum"], check_exact=False, rtol=1e-9
    )
    # windows emitted exactly once (append mode)
    assert not got.duplicated(["window_start", "event_type"]).any()


def _session_oracle(pdf, gap_minutes=30):
    d = pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    gap = pd.Timedelta(minutes=gap_minutes)
    brk = (d["ts"] - d.groupby("user_id")["ts"].shift()).gt(gap) | (
        d.groupby("user_id").cumcount() == 0
    )
    d["sess"] = brk.groupby(d["user_id"]).cumsum()
    out = d.groupby(["user_id", "sess"], as_index=False).agg(
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("ts", "size"),
        value_sum=("value", "sum"),
    )
    out["value_sum"] = out["value_sum"].round(3)
    return out.drop(columns="sess").sort_values(
        ["user_id", "session_start"]
    ).reset_index(drop=True)


@pytest.mark.slow
def test_sessionize_events_matches_oracle(spark, tmp_path):
    pdf = _events_pdf().sort_values("ts").reset_index(drop=True)
    stream_dir, out_dir = str(tmp_path / "ev"), str(tmp_path / "out")

    _write_wave(spark, stream_dir, pdf)
    sessionize_events(spark, stream_dir, out_dir).awaitTermination(120)
    # two sentinel waves: wave N's data only advances the watermark used by
    # wave N+1, and the last session times out only past last_ts + gap
    for i, days in enumerate((60, 120)):
        _write_wave(spark, stream_dir, _sentinel(i, pdf["ts"].max() + pd.Timedelta(days=days)))
        sessionize_events(spark, stream_dir, out_dir).awaitTermination(120)

    got = (
        pd.concat([pd.read_parquet(f) for f in glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)])
        .query("user_id >= 0")
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    exp = _session_oracle(pdf)
    assert len(got) == len(exp)
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["session_start"].tolist() == exp["session_start"].tolist()
    assert got["session_end"].tolist() == exp["session_end"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    pd.testing.assert_series_equal(
        got["value_sum"], exp["value_sum"], check_exact=False, rtol=1e-9
    )


@pytest.mark.slow
def test_sessionize_late_rows_within_watermark_merge(spark, tmp_path):
    """Rows arriving a micro-batch late but within the watermark must merge
    into their (still-open) session. Withheld rows are chosen INTERIOR to
    a session whose remaining events still chain within the gap, so the
    conservative merge reproduces the batch oracle exactly."""
    pdf = _events_pdf().sort_values("ts").reset_index(drop=True)
    # sf0.001 events are ~1 per user per 11 h: use a 12 h gap so sessions
    # actually chain (the default 30 min would make every event its own)
    gap_min = 720
    gap = pd.Timedelta(minutes=gap_min)
    d = pdf.sort_values(["user_id", "ts"]).reset_index(drop=True)
    prev_ts = d.groupby("user_id")["ts"].shift()
    next_ts = d.groupby("user_id")["ts"].shift(-1)
    # session assignment (same rule as the oracle)
    brk = (d["ts"] - prev_ts).gt(gap) | prev_ts.isna()
    d["sess"] = brk.groupby(d["user_id"]).cumsum()
    last_sess = d.groupby("user_id")["sess"].transform("max")
    # withhold rows interior to each user's LAST session only: earlier
    # sessions were already emitted by wave 1 (append mode cannot retract,
    # so a late row into a closed session becomes an orphan by design);
    # rows in the still-open final session merge exactly. Removal must not
    # split the session (neighbors still bridge) and one row per user
    # (adjacent withheld rows would re-open the gap).
    interior = (
        (d["sess"] == last_sess)
        & (d["ts"] - prev_ts <= gap)
        & (next_ts - d["ts"] <= gap)
        & (next_ts - prev_ts <= gap)
    )
    late = d[interior].groupby("user_id").head(1).drop(columns="sess")
    assert len(late) >= 3
    wave1 = pdf[~pdf["event_id"].isin(late["event_id"])]

    stream_dir, out_dir = str(tmp_path / "ev"), str(tmp_path / "out")
    # watermark larger than the whole data span: nothing closes during the
    # late wave, so every late row lands in an open session
    wm = "40 days"

    _write_wave(spark, stream_dir, wave1)
    sessionize_events(spark, stream_dir, out_dir, gap_minutes=gap_min, watermark=wm).awaitTermination(120)
    _write_wave(spark, stream_dir, pd.concat(
        [late, _sentinel(0, pdf["ts"].max() + pd.Timedelta(days=60))]
    ))
    sessionize_events(spark, stream_dir, out_dir, gap_minutes=gap_min, watermark=wm).awaitTermination(120)
    for i, days in enumerate((120, 180)):
        _write_wave(spark, stream_dir, _sentinel(1 + i, pdf["ts"].max() + pd.Timedelta(days=days)))
        sessionize_events(spark, stream_dir, out_dir, gap_minutes=gap_min, watermark=wm).awaitTermination(120)

    got = (
        pd.concat([pd.read_parquet(f) for f in glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)])
        .query("user_id >= 0")
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    exp = _session_oracle(pdf, gap_minutes=gap_min)
    assert got["n_events"].sum() == exp["n_events"].sum()  # no late row lost
    assert len(got) == len(exp)
    assert got["session_start"].tolist() == exp["session_start"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()


def test_dedup_events_stream_swallows_replay(spark, tmp_path):
    """At-least-once redelivery: a replayed wave must not re-emit rows;
    first arrival wins (the replay carries a different value for one key
    and must lose)."""
    import glob

    import pandas as pd

    from gfw_raster_analysis_lambda_spark.streaming.events import (
        dedup_events_stream,
    )

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    base = pd.DataFrame(
        [(i, pd.Timestamp("2024-03-01") + pd.Timedelta(minutes=i), i % 3,
          "click", float(i), "{}") for i in range(20)],
        columns=cols,
    )
    replay = base.iloc[5:15].copy()
    replay["value"] = replay["value"] + 1000.0  # late rewrite must LOSE
    stream_dir, out_dir = str(tmp_path / "ev"), str(tmp_path / "out")
    for wave in (base, replay):
        spark.createDataFrame(wave).coalesce(1).write.mode("append").parquet(stream_dir)
        dedup_events_stream(spark, stream_dir, out_dir).awaitTermination(120)
    got = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)]
    ).sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == list(range(20))
    assert (got["value"] < 1000).all()  # first arrival won everywhere


def test_cumulative_features_stream_continues_across_batches(spark, tmp_path):
    """Running (count, sum, mean) per user: state carries ACROSS
    micro-batches — wave 2's cum_n continues where wave 1 left off, and
    the integer micro-unit sums equal an exact pandas re-derivation."""
    from gfw_raster_analysis_lambda_spark.streaming.events import (
        cumulative_features_stream,
    )

    pdf = _events_pdf().sort_values("ts").reset_index(drop=True)
    half = len(pdf) // 2
    stream_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    for wave in (pdf.iloc[:half], pdf.iloc[half:]):
        _write_wave(spark, stream_dir, wave)
        cumulative_features_stream(spark, stream_dir, out_dir).awaitTermination(120)
    got = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)]
    )
    assert len(got) == len(pdf)
    # exact re-derivation: per user in (ts, event_id) order
    exp = pdf.copy()
    exp["v_u6"] = (exp["value"] * 1e6).round().astype("int64")
    exp = exp.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    exp["cum_n"] = exp.groupby("user_id").cumcount() + 1
    exp["cum_sum_u6"] = exp.groupby("user_id")["v_u6"].cumsum()
    g = got.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    assert list(g["event_id"]) == list(exp["event_id"])
    assert list(g["cum_n"]) == list(exp["cum_n"])
    assert list(g["cum_sum_u6"]) == list(exp["cum_sum_u6"])
    # state is O(1) per key: a user's final cum_n equals their row count
    assert (
        g.groupby("user_id")["cum_n"].max()
        == pdf.groupby("user_id").size()
    ).all()


def test_decontaminate_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a micro-batch that fails after a
    partial parquet flush is RETRIED with the same batch_id. The sink
    must overwrite that batch's partition, not append next to it — a
    second invocation of the batch writer for the same (batch, id) must
    leave the drained result unchanged (and a different batch_id must
    still accumulate)."""
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.streaming.curation import (
        write_decontaminate_batch,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    ).cache()
    out_dir = str(tmp_path / "out")
    batch = docs.filter(F.col("doc_id") % 2 == 0)

    def drained():
        files = glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)
        return (
            pd.concat([pd.read_parquet(f) for f in files])
            .sort_values(["doc_id", "bench_id"])
            .reset_index(drop=True)
        )

    write_decontaminate_batch(batch, 0, bench, out_dir, n=3, threshold=0.5)
    once = drained()
    assert len(once) > 0
    # retry of the SAME batch_id: no duplicates, bit-identical drain
    write_decontaminate_batch(batch, 0, bench, out_dir, n=3, threshold=0.5)
    pd.testing.assert_frame_equal(drained(), once)
    # a DIFFERENT batch_id accumulates alongside
    write_decontaminate_batch(
        docs.filter(F.col("doc_id") % 2 == 1), 1, bench, out_dir, n=3, threshold=0.5
    )
    assert len(drained()) > len(once)


def test_decontaminate_stream_drains_to_batch_result(spark, tmp_path):
    """Stream-static decontamination (foreachBatch over the broadcast
    benchmark side): documents streamed in two waves produce exactly the
    batch operator's pairs, and wave 2 is processed incrementally (the
    checkpoint tracks wave 1's files)."""
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.operators.text import (
        benchmark_contamination,
    )
    from gfw_raster_analysis_lambda_spark.streaming.curation import (
        decontaminate_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    ).cache()
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    stream_dir, out_dir = str(tmp_path / "docs"), str(tmp_path / "out")
    half = len(pdf) // 2
    counts = []
    for wave in (pdf.iloc[:half], pdf.iloc[half:]):
        _write_wave(spark, stream_dir, wave)
        decontaminate_stream(
            spark, stream_dir, bench, out_dir, n=3, threshold=0.5
        ).awaitTermination(120)
        got_files = glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)
        counts.append(sum(len(pd.read_parquet(f)) for f in got_files))
    assert counts[1] > counts[0]  # wave 2 added rows incrementally
    got = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)]
    ).sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    exp = (
        benchmark_contamination(docs, bench, n=3, threshold=0.5)
        .toPandas().sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.slow
def test_attribution_join_stream_matches_batch_oracle(spark, tmp_path):
    """Stream-stream interval join: purchases attributed to same-user
    views within 2 hours must equal the batch join, including matches
    SPLIT ACROSS micro-batches (purchase arrives a wave after its view
    — the buffered-state case the watermarked join exists for)."""
    from gfw_raster_analysis_lambda_spark.streaming.joins import (
        attribution_join_stream,
    )

    pdf = _events_pdf().sort_values("ts").reset_index(drop=True)
    stream_dir, out_dir = str(tmp_path / "ev"), str(tmp_path / "out")
    # split mid-stream: views in wave 1 whose purchases land in wave 2
    cut = len(pdf) // 2
    wm = "40 days"  # keep all wave-1 view state alive across the split

    _write_wave(spark, stream_dir, pdf.iloc[:cut])
    attribution_join_stream(
        spark, stream_dir, out_dir, watermark=wm
    ).awaitTermination(120)
    _write_wave(spark, stream_dir, pdf.iloc[cut:])
    attribution_join_stream(
        spark, stream_dir, out_dir, watermark=wm
    ).awaitTermination(120)

    got = (
        pd.concat([pd.read_parquet(f) for f in glob.glob(
            f"{out_dir}/data/**/*.parquet", recursive=True)])
        .sort_values(["view_id", "purchase_id"]).reset_index(drop=True)
    )
    v = pdf[pdf["event_type"] == "view"]
    p = pdf[pdf["event_type"] == "purchase"]
    exp = v.merge(p, on="user_id", suffixes=("_v", "_p"))
    exp = exp[(exp["ts_p"] >= exp["ts_v"])
              & (exp["ts_p"] <= exp["ts_v"] + pd.Timedelta(hours=2))]
    exp = (
        exp.assign(
            gap_us=((exp["ts_p"] - exp["ts_v"]).dt.total_seconds() * 1e6)
            .round().astype("int64"),
            value=exp["value_p"].round(3),
        )[["event_id_v", "event_id_p", "user_id", "gap_us", "value"]]
        .rename(columns={"event_id_v": "view_id", "event_id_p": "purchase_id"})
        .sort_values(["view_id", "purchase_id"]).reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(exp) > 0
    assert got["view_id"].tolist() == exp["view_id"].tolist()
    assert got["purchase_id"].tolist() == exp["purchase_id"].tolist()
    assert got["gap_us"].tolist() == exp["gap_us"].tolist()
    # no duplicate attributions across the two waves (state, not re-scan)
    assert not got.duplicated(["view_id", "purchase_id"]).any()
