"""Watermarked sequence conditions over Structured Streaming.

The batch engine's crown-jewel operator — ordered sequence matching with
strict ``ts >`` anchor advancement (reference semantics:
``/root/reference/frocket/engine/query_engine.py:221-249``) — in
incremental form. :func:`incremental_funnel` (r9) already folds
sequences per micro-batch, but its equivalence contract requires
TIME-ORDERED batch boundaries: an event arriving after a later-ts event
in a previous batch can never advance an earlier step.

:func:`watermarked_sequence_match` removes that restriction up to the
watermark delay, the standard Spark bounded-disorder contract:

* Incoming events are reduced JVM-side to ``(event-time, step bitmask)``
  pairs — the step predicates are compiled by the SAME
  ``planner.compiler.filter_to_column`` the batch engine uses, so null
  semantics match by construction and no event columns ride into state.
* Per-group state buffers the pairs that are still inside the watermark
  window. Once the event-time watermark passes an event, no
  earlier-timestamped event can arrive (Spark's watermark guarantee), so
  the prefix below the watermark is SEALED: it folds through the batch
  recurrence (greedy earliest-event, strict ``ts > anchor``, optional
  ``maxDuration`` from the greedy first anchor) in exact event-time
  order and leaves state.
* Groups with buffered events but no new arrivals are driven by an
  EVENT-TIME TIMEOUT (``GroupStateTimeout.EventTimeTimeout``): the
  timeout is re-armed to just past the oldest buffered event, so the
  watermark advancing — not new data for the group — triggers draining.

Stream ≡ batch therefore holds for ARBITRARY arrival order, as long as
no event is later than the watermark delay. Events later than that are
folded on arrival (never retroactively) or dropped by Spark's late-data
filter — the documented watermark trade-off.

``rowFound: false`` (absence steps) is supported when ``maxDuration``
bounds the window and the first step is a found step: the group buffers
its duration window ``(first_anchor, first_anchor + maxDuration]`` and
resolves ONCE — with full lookahead, exactly the batch window-anchor
recurrence — when the watermark passes the horizon (after which no
in-window event can arrive, so "no row matched" is final). State for
such groups is bounded by the duration window. UNBOUNDED absence (no
``maxDuration``) stays an honest ``NotImplementedError`` seam: "no
matching row, ever" is not decidable under finite state.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LONG_MIN = -(2**63)


def _step_mask_column(sequence: list[dict]):
    """AND-of-filters per step, OR-folded into one bitmask column —
    evaluated by Catalyst before the stateful operator, so state holds
    two longs per event regardless of how wide the event rows are."""
    from ..planner.compiler import filter_to_column

    mask = F.lit(0).cast("long")
    for i, step in enumerate(sequence):
        filters = []
        if "filter" in step:
            filters.append(step["filter"])
        if "filters" in step:
            filters.extend(step["filters"])
        pred = F.lit(True)
        for f in filters:
            f = (f if isinstance(f, dict)
                 else {"column": f[0], "op": f[1], "value": f[2]})
            pred = pred & filter_to_column(f)
        mask = mask + F.when(pred, F.lit(1 << i)).otherwise(F.lit(0))
    return mask


def watermarked_sequence_match(
    events: DataFrame,
    sequence: list[dict],
    group_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    max_duration: float | None = None,
) -> DataFrame:
    """Streaming sequence-condition evaluation with bounded disorder.

    ``events`` is a streaming DataFrame whose ``ts_col`` is a TIMESTAMP
    (the watermark axis; int64-nano datasets convert via
    ``streaming.nanos_to_timestamp``). Returns an update-mode streaming
    frame ``(group_id, steps_completed, anchor_ts, matched)`` — one row
    per group per micro-batch in which sealed events advanced its state;
    ``anchor_ts`` is epoch-MICROS of the last advanced step,
    ``max_duration`` is in SECONDS on that axis (mirroring the batch
    option, which lives on the raw time axis).

    Exactness contract: equal to the batch engine on any arrival order
    whose lateness stays under ``watermark`` (property-tested in
    tests/test_streaming_equivalence.py, ties and duplicates included).

    Draining note: a group's buffered tail only seals once the WATERMARK
    passes it, and the watermark for batch N is computed from batch
    N-1's max event time. On a finite replay (``availableNow``), follow
    the data with TWO far-future heartbeat micro-batches: the first
    raises the watermark, the second runs with it — timed-out groups are
    processed in every batch whose watermark passed their timeout, new
    data for them or not. Always-on streams need no heartbeats as long
    as events keep flowing.
    """
    row_found = [step.get("rowFound", True) is not False
                 for step in sequence]
    has_absence = not all(row_found)
    if has_absence and (max_duration is None or not row_found[0]):
        # UNBOUNDED absence stays the honest seam: "no matching row,
        # ever" is not decidable under finite state. With maxDuration
        # and a found first step, every scope is bounded by
        # first_anchor + maxDuration and the bounded-absence path below
        # resolves exactly.
        raise NotImplementedError(
            "rowFound:false needs a bounded window to be evaluated "
            "incrementally: set maxDuration and keep the first step a "
            "found step")
    if not isinstance(events.schema[ts_col].dataType, T.TimestampType):
        raise ValueError(
            f"{ts_col} must be TIMESTAMP for watermarking — convert "
            "int64-nano axes with streaming.nanos_to_timestamp first")
    n_steps = len(sequence)
    max_dur_us = None if max_duration is None else int(max_duration * 1e6)
    g_type = events.schema[group_col].dataType.simpleString()
    out_schema = (f"group_id {g_type}, steps_completed int, "
                  f"anchor_ts long, matched boolean")
    state_schema = ("steps_completed int, anchor long, first long, "
                    "buf_ts array<long>, buf_mask array<long>")

    # no-step rows (mask 0: heartbeats, unrelated events) are dropped at
    # BUFFER time inside the operator, not by a pre-operator filter — a
    # `where(mask != 0)` gets predicate-pushed below EventTimeWatermark
    # by Catalyst, and rows it removes would then stop driving the
    # watermark forward (observed: a heartbeat-only micro-batch left the
    # watermark frozen and the final drain never fired)
    reduced = (events
               .where(F.col(ts_col).isNotNull())
               .select(F.col(group_col),
                       F.col(ts_col).alias("__wm_ts"),
                       F.unix_micros(F.col(ts_col)).alias("__ts"),
                       _step_mask_column(sequence).alias("__mask"))
               .withWatermark("__wm_ts", watermark))

    def _resolve_absence(window_evs: list, first: int) -> tuple[int, int]:
        """The window-anchor recurrence over one group's fully-sealed
        duration window (first, first + maxDuration] — the same
        semantics the batch ``with_sequence_anchors`` evaluates: found
        steps anchor at the min matching ts past the previous anchor;
        an absence step passes iff NO row matches past the previous
        anchor (within the window), anchor passing through. Returns
        (steps_completed, last_anchor)."""
        a_prev, done = first, 1
        for i in range(1, n_steps):
            if row_found[i]:
                cand = [t for t, m in window_evs
                        if (m >> i) & 1 and t > a_prev]
                if not cand:
                    break
                a_prev = min(cand)
            elif any((m >> i) & 1 and t > a_prev for t, m in window_evs):
                break  # a matching row anywhere in scope kills absence
            done += 1
        return done, a_prev

    def _absence_update(key, buf, state):
        """Bounded-absence path: buffer the duration window, resolve
        ONCE when the watermark passes ``first + maxDuration`` (then the
        whole window is sealed — lookahead is safe), and drop the group
        from the store. State is bounded by the window: while the first
        anchor is unknown, sealed no-step-0 events are dropped (the
        eventual anchor can only be ≥ the watermark, so they can never
        land in scope); once known, only (first, first+maxDuration]
        events are kept."""
        seal_us = state.getCurrentWatermarkMs() * 1000
        if state.exists and state.get[0] != 0:
            # already resolved: the batch first anchor is the GLOBAL
            # min step-0 ts, so later events can never re-open the
            # group — the tombstone stops a bogus second match
            return
        first = state.get[2] if state.exists else LONG_MIN
        if first == LONG_MIN:
            sealed_a0 = [t for t, m in buf if t < seal_us and m & 1]
            if sealed_a0:
                first = min(sealed_a0)
        if first != LONG_MIN:
            horizon = first + max_dur_us
            buf = [(t, m) for t, m in buf if first < t <= horizon]
            if seal_us > horizon:  # ts == horizon is in scope: strict
                done, anch = _resolve_absence(sorted(buf), first)
                # tombstone: resolved groups keep only the scalar fold
                # state (like matched groups on the found-only path)
                state.update((done, anch, first, [], []))
                yield pd.DataFrame(
                    {"group_id": [key[0]], "steps_completed": [done],
                     "anchor_ts": [anch], "matched": [done >= n_steps]})
                return
        else:
            # no step-0 match sealed yet → any future anchor is ≥ the
            # watermark, so sealed events can never be in its scope
            buf = [(t, m) for t, m in buf if t >= seal_us]
        if buf or first != LONG_MIN:
            state.update((0, LONG_MIN, first,
                          [t for t, _ in buf], [m for _, m in buf]))
            # resolution fires when the watermark passes the horizon;
            # before the anchor exists, when it passes the oldest
            # buffered event (both strictly > current watermark)
            arm = (first + max_dur_us if first != LONG_MIN
                   else min(t for t, _ in buf))
            state.setTimeoutTimestamp(arm // 1000 + 1)
        elif state.exists:
            state.remove()

    def update(
        key: Tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            steps, anchor, first, buf_ts, buf_mask = state.get
            buf = list(zip(buf_ts, buf_mask))
        else:
            steps, anchor, first, buf = 0, LONG_MIN, LONG_MIN, []
        for pdf in batches:
            if len(pdf):
                pdf = pdf[pdf["__mask"] != 0]  # no-step rows are inert
                buf.extend(zip(pdf["__ts"].astype("int64"),
                               pdf["__mask"].astype("int64")))
        buf = [(int(t), int(m)) for t, m in buf]

        if has_absence:
            yield from _absence_update(key, buf, state)
            return

        # Spark's watermark guarantee: no future row's event time is
        # below the current watermark, so the strictly-below prefix is
        # final — fold it and drop it. The greedy event-order fold
        # ("each event advances at most one step, strict ts > anchor")
        # is equivalent to ITERATED MASKED MIN — for each step, the
        # earliest sealed event matching the step bit strictly past the
        # previous anchor (an event tied with the anchor can never
        # chain, min > anchor excludes it exactly like the ordered
        # walk) — so the fold is n_steps numpy reductions instead of a
        # Python loop + sort over every sealed event (r12; the replay
        # throughput boundary in docs/operators.md).
        seal_us = state.getCurrentWatermarkMs() * 1000
        if buf:
            ts_arr = np.fromiter((t for t, _ in buf), dtype=np.int64,
                                 count=len(buf))
            mk_arr = np.fromiter((m for _, m in buf), dtype=np.int64,
                                 count=len(buf))
            sealed_sel = ts_arr < seal_us
            s_ts, s_mk = ts_arr[sealed_sel], mk_arr[sealed_sel]
            buf = [(int(t), int(m)) for t, m in
                   zip(ts_arr[~sealed_sel], mk_arr[~sealed_sel])]
        else:
            s_ts = s_mk = None

        advanced = False
        while (s_ts is not None and len(s_ts) and steps < n_steps):
            ok = ((s_mk >> steps) & 1).astype(bool) & (s_ts > anchor)
            if max_dur_us is not None and steps > 0:
                ok &= s_ts <= first + max_dur_us
            if not ok.any():
                break
            t = int(s_ts[ok].min())
            if steps == 0:
                first = t  # greedy first anchor (earliest step-0 match)
            anchor = t
            steps += 1
            advanced = True

        if buf and steps < n_steps:
            state.update((steps, anchor, first,
                          [t for t, _ in buf], [m for _, m in buf]))
            # re-arm: fire as soon as the watermark passes the oldest
            # buffered event (must be strictly past the current
            # watermark — oldest//1000 >= wm_ms by the seal above)
            state.setTimeoutTimestamp(min(t for t, _ in buf) // 1000 + 1)
        elif advanced or state.exists:
            # matched groups and drained buffers keep only the scalar
            # fold state; timeout stays unarmed (nothing left to seal)
            state.update((steps, anchor, first, [], []))

        if advanced:
            yield pd.DataFrame(
                {"group_id": [key[0]], "steps_completed": [steps],
                 "anchor_ts": [anchor], "matched": [steps >= n_steps]})

    return reduced.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
