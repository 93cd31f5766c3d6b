"""Execute a query end-to-end and shape the reference-compatible JSON result.

The reference returns a small JSON document — counts + aggregation maps, never
row data (``/root/reference/frocket/common/tasks/query.py:98-134``,
``apiserver.py:216-247``). This engine produces the same shape from collected
Spark aggregates:

    {"query":  {"matchingGroups": N, "matchingGroupRows": N,
                "aggregations": [{"column","type","name","top","value"}, ...]},
     "funnel": {"sequence": [{"matchingGroups","matchingGroupRows",
                              "aggregations"}, ...],
                "endAggregations": [...]}}
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from funnel_rocket_spark.planner.compiler import QueryPlan
from funnel_rocket_spark.validation.validator import ExpandedQuery, expand_and_validate


class QueryEngine:
    """Runs validated queries over a DataFrame keyed by (group, timestamp).

    Unlike the reference's engine (one Pandas DataFrame per worker, results
    reduced on the invoker — ``query_engine.py:72-106``), one instance covers
    the whole dataset: Spark distributes the plan, the driver collects only
    tiny aggregates.
    """

    def __init__(self, group_id_column: str, timestamp_column: str,
                 universe_window_threshold: int = 4_000_000,
                 agg_collect_threads: int = 8,
                 whale_row_threshold: int = 4_000_000,
                 segmented_cost_premium: float = 20.0,
                 whale_hard_cap_rows: int = 2_000_000_000):
        self.group_id_column = group_id_column
        self.timestamp_column = timestamp_column
        # Legacy-path knob (max-only hint): max-group-rows above which
        # sequence_strategy="auto" routes to the segmented fold. With
        # the r11 histogram hint (group_rows_topk) routing is a COST
        # MODEL instead — see QueryPlan.__init__ and docs/operating.md
        # for the two knobs below (the measured interpreted-fold
        # premium per row, and the absolute task-size stall guard).
        self.whale_row_threshold = whale_row_threshold
        self.segmented_cost_premium = segmented_cost_premium
        self.whale_hard_cap_rows = whale_hard_cap_rows
        # matched-group count above which the row universe switches from
        # the semi join (broadcastable below this) to window flags — see
        # QueryPlan.rows_of_matching_groups
        self.universe_window_threshold = universe_window_threshold
        # multi-aggregation queries submit their N independent aggregate
        # jobs from this many threads (Spark schedules concurrent jobs;
        # the shared universe is persisted, and Spark's per-partition
        # cache locking means concurrent first-computes block rather
        # than duplicate). 1 = serial.
        self.agg_collect_threads = max(1, int(agg_collect_threads))

    def expand(self, query: dict, df: Optional[DataFrame] = None) -> ExpandedQuery:
        schema = (
            {f.name: f.dataType.simpleString() for f in df.schema.fields}
            if df is not None
            else None
        )
        return expand_and_validate(
            query,
            dataset_schema=schema,
            group_id_column=self.group_id_column,
            timestamp_column=self.timestamp_column,
        )

    def plan(self, df: DataFrame, query: dict, validate_schema: bool = True,
             sequence_strategy: str = "auto",
             fold_segments: int = 64,
             max_group_rows: Optional[int] = None,
             total_rows: Optional[int] = None,
             group_rows_topk: Optional[list[int]] = None,
             segmented_cost_premium: Optional[float] = None,
             layout: Optional[dict] = None) -> QueryPlan:
        sorted_layout = self._sorted_layout(layout)
        if sorted_layout:
            self._enable_sorted_scan(df)
        expanded = self.expand(query, df if validate_schema else None)
        return QueryPlan(df, expanded, self.group_id_column,
                         self.timestamp_column,
                         sequence_strategy=sequence_strategy,
                         fold_segments=fold_segments,
                         max_group_rows_hint=max_group_rows,
                         whale_row_threshold=self.whale_row_threshold,
                         total_rows_hint=total_rows,
                         group_rows_topk_hint=group_rows_topk,
                         # per-dataset premium measured at registration
                         # (catalog.measure_segmented_premium) wins over
                         # the engine's global default
                         segmented_cost_premium=(
                             segmented_cost_premium
                             if segmented_cost_premium is not None
                             else self.segmented_cost_premium),
                         whale_hard_cap_rows=self.whale_hard_cap_rows,
                         sorted_layout_hint=sorted_layout)

    def _sorted_layout(self, layout: Optional[dict]) -> bool:
        """True when the dataset's declared layout
        (``Dataset.layout``, recorded from the bucketed table's
        DESCRIBE at registration) clusters AND orders rows the way the
        per-group engine consumes them: ``bucketBy(group_id)`` with
        ``sortBy(group_id, ts)``. On that layout the scan itself
        satisfies the window-anchor pass's required distribution and
        ordering — no exchange, no sort (Spark reports the file order
        only for single-file buckets; ``sources.write_bucketed``
        aligns one file per bucket for exactly this reason)."""
        if not layout:
            return False
        sort = layout.get("sort_columns") or []
        return (layout.get("bucket_columns") == [self.group_id_column]
                and sort[:2] == [self.group_id_column,
                                 self.timestamp_column])

    @staticmethod
    def _enable_sorted_scan(df: DataFrame) -> None:
        """Since Spark 3.0 a bucketed scan reports its sortBy order only
        under ``spark.sql.legacy.bucketedTableScan.outputOrdering`` —
        gated off by default because the plan then depends on the
        files-per-bucket count (SPARK-28595). It stays CORRECT with the
        flag on: Spark still refuses to report ordering for multi-file
        buckets, and ``sources.write_bucketed`` aligns one file per
        bucket precisely so this reports. Enabled at the engine
        chokepoint (dynamic session conf) whenever a declared sorted
        layout reaches plan() — without it the first Window re-sorts
        the data the layout already ordered."""
        df.sparkSession.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

    def run(self, df: DataFrame, query: dict, validate_schema: bool = True,
            with_stats: bool = False, sequence_strategy: str = "auto",
            fold_segments: int = 64,
            max_group_rows: Optional[int] = None,
            total_rows: Optional[int] = None,
            group_rows_topk: Optional[list[int]] = None,
            segmented_cost_premium: Optional[float] = None,
            layout: Optional[dict] = None) -> dict:
        """Execute and return the reference-shaped result JSON.

        ``with_stats`` adds a ``stats`` block shaped after the reference's
        (``/root/reference/frocket/invoker/stats_builder.py:42-86``, example
        ``docs/api.md:645-736``): task counts, scanned rows/bytes, shuffle
        and spill volumes, CPU/GC time, dataset parts/size — here read
        from Spark's AppStatusStore for the query's own job group instead
        of a Lambda metrics frame (see ``engine/metrics.py``).
        """
        import time as _time

        from funnel_rocket_spark.engine.metrics import (JobGroupMetrics,
                                                        dataset_stats)

        t0 = _time.perf_counter()
        plan = self.plan(df, query, validate_schema=validate_schema,
                         sequence_strategy=sequence_strategy,
                         fold_segments=fold_segments,
                         max_group_rows=max_group_rows,
                         total_rows=total_rows,
                         group_rows_topk=group_rows_topk,
                         segmented_cost_premium=segmented_cost_premium,
                         layout=layout)
        sorted_layout = plan.sorted_layout_hint
        q = plan.q

        query_aggs = q.get("query", {}).get("aggregations") or []
        funnel = q.get("funnel")
        rows = None
        rows_persisted = False
        rows_strategy = None
        metrics_mgr = None
        if with_stats:
            metrics_mgr = JobGroupMetrics(df.sparkSession)
            metrics_mgr.__enter__()
        matched = None
        try:
            if plan._conditions and (query_aggs or funnel is not None):
                # the matched-group frame feeds counts AND every
                # join-universe build side below: persist it so the
                # condition pass runs ONCE per query, not once per
                # consumer. Before r11 the semi-join universe re-ran the
                # whole per-group aggregation (for a fold_segmented plan,
                # the most expensive stage in the query) as its build
                # side. The frame is one row per matched group — bounded
                # by n_groups, column-pruned to (group, __fr_rows, flags).
                matched = plan.matched_groups()
                matched.persist(StorageLevel.MEMORY_AND_DISK)
            counts = plan.counts(matched).collect()[0]
            if query_aggs:  # the universe feeds query aggregations only;
                # the funnel branch derives its own per-group frame
                # adaptive universe: the matched-group count is already in
                # hand. A small set → semi join (AQE broadcasts it); a set
                # too big to broadcast would sort-merge the whole table, so
                # evaluate the same conditions as window flags instead —
                # join-free, measured 2.9× at 100M rows with 71% of groups
                # matching. Fold-family sequences can't window their flags
                # (that would re-introduce the whale partition sort the
                # fold was chosen to avoid), so past the threshold they
                # take the shuffle_hash semi join — big side shuffled but
                # never sorted (r11; within ~1.1× of the windowed
                # universe on the 100M rung, tools/scale_check.py
                # universe).
                many = (counts["matching_groups"]
                        > self.universe_window_threshold)
                fold_family = (plan._seq_specs
                               and plan.sequence_strategy
                               in ("fold", "fold_segmented"))
                rows_strategy = (
                    ("hash_join" if fold_family else "window")
                    if many else "join")
                # NOTE (r12, measured): a declared sorted layout does
                # NOT flip this choice to "window" unconditionally —
                # on bucketBy(group)+sortBy(group, ts) the semi join's
                # big side is ALSO exchange-free and sort-free (the
                # declared order satisfies the SMJ), and the join
                # reuses the persisted matched frame while the window
                # pass re-evaluates conditions as flags. The 100M rung
                # (tools/rung_bucketed_100m_r12.json) has the join at
                # 1.16 s vs window 1.84 s selective and 1.69 vs 1.92
                # broad, so the matched-count threshold stays the
                # right picker on every layout.
                rows = plan.rows_of_matching_groups(strategy=rows_strategy,
                                                    matched=matched)
                if len(query_aggs) > 1:
                    # caching the universe pays only when several
                    # aggregations read it; for one consumer the
                    # materialization is pure overhead (measured 35 s vs
                    # 13 s at 100M rows on the window path)
                    rows.persist(StorageLevel.MEMORY_AND_DISK)
                    rows_persisted = True
            result: dict = {
                "query": {
                    "matchingGroups": counts["matching_groups"],
                    "matchingGroupRows": counts["matching_group_rows"],
                    "aggregations": self._collect_aggregations(plan, query_aggs, rows),
                }
            }

            if funnel is not None:
                # the funnel universe reuses the adaptive policy: windowed
                # condition flags when the matched-group set is beyond
                # broadcast scale; fold-family plans take the
                # shuffle_hash semi join there instead (no big-side sort)
                anchors_ok = not (
                    (plan._seq_specs or plan._funnel_spec is not None)
                    and plan.sequence_strategy
                    in ("fold", "fold_segmented"))
                has_conditions = bool(
                    q.get("query", {}).get("conditions") or [])
                many_f = (counts["matching_groups"]
                          > self.universe_window_threshold)
                uni = ("window" if anchors_ok else "hash_join") \
                    if many_f and has_conditions else "join"
                # One row per group; step counts and every step-rows semi
                # join derive from it (plan-equal rebuilds hit this cache).
                frows = plan.funnel_per_group(uni, matched=matched)
                frows.persist(StorageLevel.MEMORY_AND_DISK)
                step_aggs = funnel.get("stepAggregations") or []
                end_aggs = funnel.get("endAggregations") or []
                n_steps = len(funnel["sequence"])
                # funnel_step_rows re-derives rows_of_matching_groups once
                # per step-rows job; with step aggregations over several
                # steps (or step+end aggs) that's several executions of the
                # same semi-join/window universe. Persist it once — the
                # plan-equal rebuilds inside funnel_step_rows hit this
                # cache — mirroring the multi-aggregation rule above.
                funnel_universe = None
                universe_consumers = ((n_steps if step_aggs else 0)
                                      + (1 if end_aggs else 0))
                if universe_consumers > 1 and not (
                        rows_persisted and rows_strategy == uni):
                    funnel_universe = plan.rows_of_matching_groups(
                        uni, matched=matched)
                    funnel_universe.persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    step_counts = {
                        r["step"]: r
                        for r in plan.funnel_step_counts(
                            uni, matched=matched).collect()
                    }

                    def step_rows(i: int):
                        # per-step adaptive: many groups pass → anchor
                        # filter (join-free) or, for fold-family plans,
                        # the shuffle_hash semi join; few → semi join
                        # against the cached per-group frame
                        many = (step_counts[i]["matching_groups"]
                                > self.universe_window_threshold)
                        strat = ("window" if anchors_ok
                                 else "hash_join") if many else "join"
                        return plan.funnel_step_rows(
                            i, universe_strategy=uni, step_strategy=strat,
                            matched=matched)

                    if (step_aggs and n_steps > 1
                            and self.agg_collect_threads > 1):
                        # overlap the whole step-agg phase: each step's
                        # aggregations are independent jobs over the
                        # persisted per-group frame / universe. serial=True
                        # suppresses _collect_aggregations' inner pool —
                        # nesting would run up to threads² concurrent jobs
                        step_agg_out = self._pool_map(
                            plan.df, min(n_steps, self.agg_collect_threads),
                            lambda i: self._collect_aggregations(
                                plan, step_aggs, step_rows(i), serial=True),
                            range(n_steps))
                    else:
                        step_agg_out = [
                            self._collect_aggregations(
                                plan, step_aggs, step_rows(i))
                            if step_aggs else None
                            for i in range(n_steps)]
                    sequence = []
                    for i in range(n_steps):
                        sc = step_counts[i]
                        entry = {
                            "matchingGroups": sc["matching_groups"],
                            "matchingGroupRows": sc["matching_group_rows"],
                            "aggregations": step_agg_out[i],
                        }
                        sequence.append(entry)
                    result["funnel"] = {
                        "sequence": sequence,
                        "endAggregations": self._collect_aggregations(
                            plan, end_aggs, step_rows(n_steps - 1))
                        if end_aggs else None,
                    }
                finally:
                    frows.unpersist()
                    if funnel_universe is not None:
                        funnel_universe.unpersist()
            else:
                result["funnel"] = None
            if with_stats:
                stats = {
                    "engine": "spark",
                    "success": True,
                    "totalSeconds": round(_time.perf_counter() - t0, 4),
                    # which physical plans the optimizer actually chose —
                    # the observability that makes the r10 skew routing
                    # auditable from a result JSON alone
                    "strategies": {
                        "sequence": plan.sequence_strategy,
                        "autoRoutedSegmented": plan.auto_routed_segmented,
                        "autoRouteReason": plan.auto_route_reason,
                        "routeEstimates": plan.route_estimates,
                        "effectiveWhaleThreshold":
                            plan.effective_whale_threshold,
                        "maxGroupRowsHint": plan.max_group_rows_hint,
                        "groupRowsTopkHint": plan.group_rows_topk_hint,
                        "rowUniverse": rows_strategy,
                        "sortedLayout": sorted_layout,
                    },
                    "usedColumns": plan.expanded.used_columns,
                    "sparkAppId": df.sparkSession.sparkContext.applicationId,
                    "defaultParallelism":
                        df.sparkSession.sparkContext.defaultParallelism,
                    "dataset": dataset_stats(df),
                }
                stats.update(metrics_mgr.snapshot())
                result["stats"] = stats
            return result
        finally:
            if metrics_mgr is not None:
                metrics_mgr.__exit__(None, None, None)
            if rows_persisted:
                rows.unpersist()
            if matched is not None:
                matched.unpersist()

    @staticmethod
    def _pool_map(df: DataFrame, n_workers: int, fn, items) -> list:
        """ThreadPoolExecutor.map that propagates the calling thread's
        Spark job group into every worker thread. setJobGroup backs onto
        thread-LOCAL properties (test-pinned by
        test_job_group_stats_are_thread_scoped), so jobs submitted from
        bare pool threads would escape the query's JobGroupMetrics group
        and silently vanish from the with_stats scan/shuffle counters."""
        from concurrent.futures import ThreadPoolExecutor

        sc = df.sparkSession.sparkContext
        props = {k: sc.getLocalProperty(k)
                 for k in ("spark.jobGroup.id", "spark.job.description",
                           "spark.jobGroup.interruptOnCancel")}

        def wrapped(item):
            for k, v in props.items():
                if v is not None:
                    sc.setLocalProperty(k, v)
            return fn(item)

        with ThreadPoolExecutor(n_workers) as ex:
            return list(ex.map(wrapped, items))

    def _collect_aggregations(
        self, plan: QueryPlan, aggs: list[dict], rows: Optional[DataFrame],
        serial: bool = False,
    ) -> Optional[list[dict]]:
        if not aggs:
            return None

        def one(agg: dict) -> dict:
            adf = plan.aggregation_df(agg, rows)
            collected = adf.collect()
            if agg["type"] == "count":
                value: object = collected[0]["count"] if collected else 0
                top = None
            else:
                metric = adf.columns[-1]
                value = {str(r["value"]): r[metric] for r in collected}
                top = int(agg.get("top", 10))
            return {
                "column": agg["column"],
                "type": agg["type"],
                "name": agg.get("name"),
                "top": top,
                "value": value,
            }

        if serial or len(aggs) == 1 or self.agg_collect_threads == 1:
            return [one(a) for a in aggs]
        # N independent tiny-result jobs over the (persisted) universe:
        # submit them concurrently instead of serially awaiting each —
        # Spark's scheduler interleaves the jobs across idle cores, so a
        # multi-aggregation query's agg phase costs ~the slowest job,
        # not the sum. map() preserves input order for the result JSON.
        return self._pool_map(plan.df, min(len(aggs),
                                           self.agg_collect_threads),
                              one, aggs)
