"""Always-on behavior/retention report stream (streaming/behavior_stream.py):
the foreachBatch-maintained reports must equal the batch behavior
operators on the same rows once the source drains, for ARBITRARY arrival
order (retention is order-insensitive: distinct + min — no watermark, no
heartbeats), and a restart on the same workdir must fold NEW data into
the same reports. Pre-epoch (negative-nanos) timestamps ride along to
exercise the pmod floor-bucketing both code paths share."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from funnel_rocket_spark.operators import behavior
from funnel_rocket_spark.streaming import start_behavior_report_stream

DAY = behavior.NANOS_DAY
HORIZONS = (1, 2)


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


def _write_chunks(indir, rows, cuts, start=0):
    chunks = _split(rows, cuts)
    for i, chunk in enumerate(chunks, start=start):
        pd.DataFrame(chunk).to_parquet(indir / f"b{i:02d}.parquet")
    return start + len(chunks)


def _stream(spark, indir):
    return (spark.readStream.schema("user_id long, ts long")
            .option("maxFilesPerTrigger", "1").parquet(str(indir)))


def _batch_reports(spark, rows):
    df = spark.createDataFrame(pd.DataFrame(rows))
    cohorts = {(r["cohort"], r["period_index"]): r["n_active"]
               for r in behavior.retention_cohorts(
                   df, "user_id", "ts", DAY).collect()}
    rates = {r["cohort"]: (r["n_groups"],
                           *[r[f"rate_p{h}"] for h in HORIZONS])
             for r in behavior.retention_rates(
                 df, "user_id", "ts", period=DAY,
                 horizons=list(HORIZONS)).collect()}
    # DAU rollup oracle in plain python: distinct actives + raw rows
    per = {}
    for r in rows:
        p = r["ts"] - r["ts"] % DAY
        users, n = per.get(p, (set(), 0))
        per[p] = (users | {r["user_id"]}, n + 1)
    rollup = {p: (len(users), n) for p, (users, n) in per.items()}
    return cohorts, rates, rollup


def _got_reports(spark, handle):
    cohorts = {(r["cohort"], r["period_index"]): r["n_active"]
               for r in handle.retention_cohorts(spark).collect()}
    rates = {r["cohort"]: (r["n_groups"],
                           *[r[f"rate_p{h}"] for h in HORIZONS])
             for r in handle.retention_rates(spark).collect()}
    rollup = {r["period"]: (r["n_active"], r["n_rows"])
              for r in handle.activity_rollup(spark).collect()}
    return cohorts, rates, rollup


events_st = st.lists(
    st.tuples(st.integers(1, 4),          # user
              st.integers(-2, 6),         # day offset (incl. pre-epoch)
              st.integers(0, 23)),        # hour inside the day
    min_size=1, max_size=15)


def test_behavior_report_stream_equals_batch_any_arrival_order(
        spark, tmp_path):
    run_no = [0]

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(events=events_st, order=st.randoms(use_true_random=False),
           cuts=st.lists(st.integers(0, 14), max_size=3))
    def prop(events, order, cuts):
        run_no[0] += 1
        base = tmp_path / f"br{run_no[0]}"
        indir = base / "in"
        indir.mkdir(parents=True)
        rows = [{"user_id": u, "ts": d * DAY + h * 3_600_000_000_000}
                for u, d, h in events]
        arrival = rows[:]
        order.shuffle(arrival)
        _write_chunks(indir, arrival, cuts)

        handle = start_behavior_report_stream(
            _stream(spark, indir), "user_id", "ts",
            workdir=str(base / "work"), period=DAY, horizons=HORIZONS,
            compact_every=2, available_now=True)
        handle.await_termination(180)

        assert _got_reports(spark, handle) == _batch_reports(spark, rows)

    prop()


def test_behavior_report_stream_restart_folds_new_data(spark, tmp_path):
    """Stop after the first tranche, append a second tranche of files,
    restart on the SAME workdir: the checkpoint resumes past the folded
    batches and the reports converge to the batch answer over ALL rows
    (including a late event that moves a user's cohort EARLIER)."""
    base = tmp_path / "restart"
    indir = base / "in"
    indir.mkdir(parents=True)
    first = [{"user_id": 1, "ts": 2 * DAY}, {"user_id": 1, "ts": 3 * DAY},
             {"user_id": 2, "ts": 2 * DAY}]
    nxt = _write_chunks(indir, first, [1])

    def run():
        h = start_behavior_report_stream(
            _stream(spark, indir), "user_id", "ts",
            workdir=str(base / "work"), period=DAY, horizons=HORIZONS,
            available_now=True)
        h.await_termination(180)
        return h

    handle = run()
    assert _got_reports(spark, handle) == _batch_reports(spark, first)

    # user 1's cohort moves from day 2 to day 0; user 3 appears new
    second = [{"user_id": 1, "ts": 0}, {"user_id": 3, "ts": 3 * DAY},
              {"user_id": 3, "ts": 4 * DAY}]
    _write_chunks(indir, second, [1], start=nxt)
    handle = run()
    assert _got_reports(spark, handle) == _batch_reports(
        spark, first + second)
