"""Always-on sequence report stream (streaming/report_stream.py):
the foreachBatch-maintained funnel report must equal the batch engine's
step counts / per-value aggregations once the source drains, for
arbitrary arrival order — and a restart on the same workdir must resume
from the checkpoints and fold NEW data into the same reports."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from funnel_rocket_spark import QueryEngine
from funnel_rocket_spark.streaming import start_sequence_report_stream

WSEQ = [{"filter": ["etype", "==", "view"]},
        {"filter": ["etype", "==", "click"]},
        {"filter": ["etype", "==", "purchase"]}]
_H1 = {"user_id": 999, "ts": "2026-01-02 00:00:00", "etype": "hb",
       "metric": 0.0}
_H2 = {"user_id": 999, "ts": "2026-01-03 00:00:00", "etype": "hb",
       "metric": 0.0}


def _split(items: list, cuts: list[int]) -> list[list]:
    bounds = sorted({c % (len(items) + 1) for c in cuts})
    out, prev = [], 0
    for b in bounds:
        if b > prev:
            out.append(items[prev:b])
            prev = b
    if prev < len(items):
        out.append(items[prev:])
    return out or [items]


def _stream(spark, indir):
    return (spark.readStream
            .schema("user_id long, ts string, etype string, metric double")
            .option("maxFilesPerTrigger", "1").parquet(str(indir))
            .select("user_id", F.to_timestamp("ts").alias("ts"),
                    "etype", "metric"))


def _batch_oracle(spark, rows):
    """The batch engine's step counts + a pandas per-value battery over
    its own per-group funnel frame (same oracle as the store tests)."""
    df = (spark.createDataFrame(pd.DataFrame(rows))
          .select("user_id", F.to_timestamp("ts").alias("ts"),
                  "etype", "metric"))
    plan = QueryEngine("user_id", "ts").plan(
        df, {"funnel": {"sequence": WSEQ}})
    counts = {r["step"]: (r["matching_groups"], r["matching_group_rows"])
              for r in plan.funnel_step_counts().collect()}
    done = {r["user_id"]: r["__fr_done"]
            for r in plan.funnel_per_group().collect()}
    values = {}
    for i in range(len(WSEQ)):
        passing = {u for u, d in done.items() if d > i}
        by_val: dict = {}
        for r in rows:
            if r["user_id"] in passing:
                c, g, s = by_val.get(r["etype"], (0, set(), 0.0))
                by_val[r["etype"]] = (c + 1, g | {r["user_id"]},
                                      s + r["metric"])
        for val, (c, g, s) in by_val.items():
            values[(i, val)] = (c, len(g), s)
    return counts, values


def _got_reports(spark, handle):
    counts = {r["step"]: (r["matching_groups"], r["matching_group_rows"])
              for r in handle.step_counts(spark).collect()}
    values = {(r["step"], r["value"]): (r["count"], r["groups"], r["sum"])
              for r in handle.value_aggs(spark).collect()}
    return counts, values


def _assert_reports_equal(got, want, ctx):
    gc, gv = got
    wc, wv = want
    assert gc == wc, (ctx, gc, wc)
    assert set(gv) == set(wv), (ctx, gv, wv)
    for k in wv:
        assert gv[k][:2] == wv[k][:2], (ctx, k, gv[k], wv[k])
        assert abs(gv[k][2] - wv[k][2]) < 1e-9, (ctx, k, gv[k], wv[k])


events_st = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 9),
              st.sampled_from(["view", "click", "purchase", "other"]),
              st.integers(-3, 5)),
    min_size=1, max_size=12)


def test_report_stream_equals_batch_any_arrival_order(spark, tmp_path):
    run_no = [0]

    @settings(max_examples=4, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(events=events_st, order=st.randoms(use_true_random=False),
           cuts=st.lists(st.integers(0, 12), max_size=2))
    def prop(events, order, cuts):
        run_no[0] += 1
        base = tmp_path / f"r{run_no[0]}"
        indir = base / "in"
        indir.mkdir(parents=True)
        rows = [{"user_id": u, "ts": f"2026-01-01 00:00:{t:02d}",
                 "etype": e, "metric": float(v)}
                for u, t, e, v in events]
        arrival = rows[:]
        order.shuffle(arrival)
        chunks = _split(arrival, cuts) + [[_H1], [_H2]]
        for i, chunk in enumerate(chunks):
            pd.DataFrame(chunk).to_parquet(indir / f"b{i:02d}.parquet")

        # compact_every=2 exercises store compaction mid-replay
        h = start_sequence_report_stream(
            _stream(spark, indir), WSEQ, "user_id", "ts", "etype",
            workdir=str(base / "wd"), metric_col="metric",
            watermark="3600 seconds", compact_every=2,
            available_now=True)
        h.await_termination(180)
        _assert_reports_equal(_got_reports(spark, h),
                              _batch_oracle(spark, rows),
                              (rows, arrival, cuts))

    prop()


def test_report_stream_restart_folds_new_data(spark, tmp_path):
    """Phase 1 replays an out-of-order head with NO heartbeats (nothing
    seals — the reports may not even exist yet); phase 2 appends the
    tail + heartbeats and restarts on the SAME workdir. The checkpoints
    must resume both queries (no re-read, no double count) and the
    published reports must equal the batch engine over ALL rows."""
    rows = [
        {"user_id": 1, "ts": "2026-01-01 00:00:05", "etype": "click",
         "metric": 2.0},
        {"user_id": 1, "ts": "2026-01-01 00:00:01", "etype": "view",
         "metric": 1.0},
        {"user_id": 2, "ts": "2026-01-01 00:00:02", "etype": "view",
         "metric": -1.0},
        {"user_id": 1, "ts": "2026-01-01 00:00:07", "etype": "purchase",
         "metric": 3.0},
        {"user_id": 2, "ts": "2026-01-01 00:00:04", "etype": "other",
         "metric": 5.0},
    ]
    indir = tmp_path / "in"
    indir.mkdir(parents=True)
    wd = str(tmp_path / "wd")

    def run_phase():
        h = start_sequence_report_stream(
            _stream(spark, indir), WSEQ, "user_id", "ts", "etype",
            workdir=wd, metric_col="metric",
            watermark="3600 seconds", available_now=True)
        h.await_termination(180)
        return h

    pd.DataFrame(rows[:2]).to_parquet(indir / "b00.parquet")
    pd.DataFrame(rows[2:3]).to_parquet(indir / "b01.parquet")
    run_phase()

    pd.DataFrame(rows[3:]).to_parquet(indir / "b02.parquet")
    pd.DataFrame([_H1]).to_parquet(indir / "b03.parquet")
    pd.DataFrame([_H2]).to_parquet(indir / "b04.parquet")
    h = run_phase()
    _assert_reports_equal(_got_reports(spark, h),
                          _batch_oracle(spark, rows), rows)
    # user 1 completes the funnel (view@1 < click@5 < purchase@7): the
    # report's last step counts exactly that group's rows
    sc = {r["step"]: r["matching_group_rows"]
          for r in h.step_counts(spark).collect()}
    assert sc[2] == 3
