"""Incremental funnel over Structured Streaming.

EXTENSION beyond the reference: funnel-rocket is strictly batch
(``/root/reference/docs/api.md:93-128`` — its "streaming" is HTTP progress
chunks). The natural Spark expression of an always-on funnel is
``applyInPandasWithState``: per-group state carries (furthest step reached,
anchor timestamp of that step); each micro-batch advances state with the same
greedy earliest-event semantics as the batch engine (strict ``ts >`` anchor,
reference ``query_engine.py:221-249``).

Semantics/caveats:
* Within a batch, events are sorted by ts — intra-batch disorder is fine.
* Cross-batch late events cannot retroactively advance an earlier step
  (standard streaming trade-off; a watermark-delay + re-sort stage can be
  put in front if bounded disorder must be tolerated).
* ``rowFound: false`` steps are rejected — absence-over-unbounded-future is
  not decidable incrementally.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# schemas are built per-call from the actual group/ts column types:
# forcing anchor_ts through double would quantize int64 epoch-nanos to
# ~256 ns steps and break strict ts > anchor comparisons — the exact
# hazard planner.compiler.ts_numeric documents for the batch engine


def _pandas_filter(pdf: pd.DataFrame, f: dict) -> pd.Series:
    """Single filter with the engine's null semantics, on Pandas (the
    in-state mirror of planner.compiler.filter_to_column)."""
    col, op, value = pdf[f["column"]], f["op"], f["value"]
    if op == "==":
        return col == value
    if op == "!=":
        return (col != value) | col.isna()
    if op == "contains":
        return col.str.contains(value, regex=False, na=False)
    if op == "not contains":
        # nulls MATCH 'not contains' — same as the batch engine's
        # coalesce(~contains, true) (planner.compiler.filter_to_column)
        return ~col.str.contains(value, regex=False, na=False)
    if op == "regex":
        return col.str.contains(value, regex=True, na=False)
    return {"<": col < value, "<=": col <= value,
            ">": col > value, ">=": col >= value}[op]


def _step_pred(pdf: pd.DataFrame, step: dict) -> pd.Series:
    filters = []
    if "filter" in step:
        filters.append(step["filter"])
    if "filters" in step:
        filters.extend(step["filters"])
    mask = pd.Series(True, index=pdf.index)
    for f in filters:
        mask &= _pandas_filter(pdf, f)
    return mask


def incremental_funnel(
    events: DataFrame,
    sequence: list[dict],
    group_col: str,
    ts_col: str,
    timeout: str = "NoTimeout",
    max_duration: float | None = None,
) -> DataFrame:
    """events (streaming DF) → per-group funnel progress updates.

    Returns a streaming DataFrame (group_id, steps_completed, anchor_ts)
    in update mode — one row per group per batch in which its state changed.

    ``max_duration`` mirrors the batch engine option: steps ≥ 1 only
    advance within ``max_duration`` of the FIRST step's anchor (the
    per-group state carries that anchor, so the bound holds across
    micro-batches).
    """
    for step in sequence:
        if step.get("rowFound", True) is False:
            raise NotImplementedError(
                "rowFound:false cannot be evaluated incrementally")
    n_steps = len(sequence)
    # Null-ts rows are inert (the batch engine's null-coalesced predicates
    # never match them) — drop them BEFORE the stateful operator: besides
    # implementing that contract, a null in an int64 ts column would force
    # the Arrow->pandas conversion to float64 and quantize epoch-nanos for
    # the whole batch, breaking strict ts > anchor chains
    events = events.where(F.col(ts_col).isNotNull())
    g_type = events.schema[group_col].dataType.simpleString()
    ts_type = events.schema[ts_col].dataType.simpleString()
    ts_is_int = ts_type in ("long", "bigint", "int", "integer",
                            "smallint", "tinyint")
    out_schema = (f"group_id {g_type}, steps_completed int, "
                  f"anchor_ts {ts_type}")
    state_schema = (f"steps_completed int, anchor_ts {ts_type}, "
                    f"first_ts {ts_type}")

    def update(
        key: Tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            steps_done, anchor, first = state.get
        else:
            steps_done, anchor, first = 0, None, None

        # ONE sorted frame per micro-batch: the Arrow iterator chunks a
        # big group's batch at maxRecordsPerBatch, and sorting each chunk
        # independently would make the result depend on arbitrary chunk
        # boundaries — the docstring promises intra-BATCH disorder is fine
        chunks = list(batches)
        pdf = (pd.concat(chunks, ignore_index=True)
               if len(chunks) > 1 else (chunks[0] if chunks else None))
        advanced = False
        if pdf is not None and len(pdf):
            pdf = pdf.sort_values(ts_col)
            preds = [_step_pred(pdf, s) for s in sequence]
            for idx in pdf.index:
                if steps_done >= n_steps:
                    break
                # One event advances at most one step (strict ts > anchor
                # also prevents same-timestamp chaining, like the batch path)
                if preds[steps_done].loc[idx]:
                    raw = pdf.at[idx, ts_col]
                    if pd.isna(raw):
                        # a null-ts row is inert like the batch engine's
                        # null-coalesced predicates — advancing on NaN
                        # would poison the anchor and disable every later
                        # ordering/duration check
                        continue
                    # keep the column's own arithmetic: int64 nanos stay
                    # exact; float stays float
                    ts_val = int(raw) if ts_is_int else float(raw)
                    if anchor is not None and ts_val <= anchor:
                        continue
                    if (max_duration is not None and steps_done > 0
                            and ts_val > first + max_duration):
                        continue
                    anchor = ts_val
                    if steps_done == 0:
                        first = ts_val
                    steps_done += 1
                    advanced = True

        if advanced:
            state.update((steps_done, anchor, first))
            yield pd.DataFrame(
                {"group_id": [key[0]], "steps_completed": [steps_done],
                 "anchor_ts": [anchor]}
            )

    return events.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
