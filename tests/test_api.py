"""API-server tests via Flask's test client against a live SparkSession —
mirrors the reference's service-tier tests (SURVEY §5 tier 3)."""

import json

import pytest

from funnel_rocket_spark.api import create_app

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    catalog = str(tmp_path_factory.mktemp("api_catalog"))
    app = create_app(spark=spark, catalog_dir=catalog)
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield c


def test_register_and_list(client):
    r = client.post("/datasets/register", json={
        "name": "ev", "basepath": SF_EVENTS,
        "group_id_column": "user_id", "timestamp_column": "ts"})
    assert r.status_code == 200
    body = r.get_json()
    assert body["success"] and body["dataset"]["totalRows"] == 1000

    r = client.get("/datasets")
    assert [d["name"] for d in r.get_json()] == ["ev"]

    r = client.get("/datasets/ev/schema")
    assert r.get_json()["groupIdColumn"] == "user_id"
    assert "event_type" in r.get_json()["columns"]
    # short form omits the profile; ?full=true includes it
    assert "top_values" not in r.get_json()["columns"]["event_type"]
    r = client.get("/datasets/ev/schema?full=true")
    assert "top_values" in r.get_json()["columns"]["event_type"]

    r = client.get("/datasets/ev/parts")
    body = r.get_json()
    assert body["totalParts"] >= 1 and body["totalSize"] > 0
    assert all(p["name"].endswith(".parquet") for p in body["parts"])


def test_query_routes(client):
    q = {"query": {"conditions": [
        {"filter": ["event_type", "==", "purchase"], "target": ["count", ">=", 3]}]}}
    r = client.post("/datasets/ev/query", json=q)
    assert r.status_code == 200
    body = r.get_json()
    assert body["query"]["matchingGroups"] == 15
    stats = body["stats"]
    assert stats["engine"] == "spark"
    # reference-stats parity (stats_builder.py / docs/api.md 645-736):
    # task counts, scan volume, shuffle volume, dataset parts/size — all
    # read from the query's own job group in the AppStatusStore
    assert stats["invoker"]["totalTasks"] > 0
    assert stats["invoker"]["failedTasks"] == 0
    assert stats["invoker"]["jobs"] >= 1
    w = stats["worker"]
    assert w["scannedRows"] == 1000          # every event row scanned once
    assert w["scannedBytes"] > 0
    assert w["shuffleWriteBytes"] > 0        # the groupBy exchange
    assert w["shuffleReadRecords"] == w["shuffleWriteRecords"]
    assert w["executorRunSeconds"] > 0
    assert stats["cost"] >= 0  # reference's priced-compute field
    # per-task timing distribution (reference worker totalTime analog)
    assert stats["worker"]["taskTime"]["max"] >= stats["worker"]["taskTime"]["min"]
    assert stats["dataset"]["parts"] >= 1 and stats["dataset"]["totalSize"] > 0
    # reference envelope: success + "<unix-seconds>-<hex8>" request id
    assert body["success"] is True
    secs, _, tail = body["requestId"].partition("-")
    assert secs.isdigit() and len(tail) == 8

    r = client.get("/datasets/ev/empty-query")
    assert r.get_json()["query"]["matchingGroupRows"] == 1000


def test_unregister_in_use_guard(spark, tmp_path_factory):
    """A just-queried dataset refuses unregistration (500) unless
    ?force=true; response reports datasetFound/datasetLastUsed and a
    missing dataset does not fail."""
    catalog = str(tmp_path_factory.mktemp("unreg_catalog"))
    app = create_app(spark=spark, catalog_dir=catalog)
    app.config["TESTING"] = True
    with app.test_client() as c:
        c.post("/datasets/register", json={
            "name": "g", "basepath": SF_EVENTS,
            "group_id_column": "user_id", "timestamp_column": "ts"})
        assert c.get("/datasets/g/empty-query").status_code == 200

        r = c.post("/datasets/g/unregister")
        assert r.status_code == 500 and r.get_json()["success"] is False

        r = c.post("/datasets/g/unregister?force=true")
        body = r.get_json()
        assert r.status_code == 200 and body["success"]
        assert body["datasetFound"] is True
        assert body["datasetLastUsed"] is not None

        r = c.post("/datasets/g/unregister")
        assert r.status_code == 200
        assert r.get_json()["datasetFound"] is False


def test_query_streaming_progress(client):
    r = client.post("/datasets/ev/query?stream=true", json={})
    lines = [json.loads(ln) for ln in r.get_data(as_text=True).splitlines()]
    assert len(lines) >= 1
    final = lines[-1]
    assert final["query"]["matchingGroups"] == 15
    for progress in lines[:-1]:
        assert progress["stage"] == "running"


def test_register_missing_required_fields_is_400(client):
    """A missing required register field must keep the JSON 400 contract,
    not surface as a Flask 500 KeyError page."""
    r = client.post("/datasets/register", json={"basepath": "/nope"})
    assert r.status_code == 400
    body = r.get_json()
    assert body["success"] is False
    assert "missing required field" in body["errorMessage"]
    assert "name" in body["errorMessage"]


def test_streaming_invalid_query_is_http_400(client):
    """?stream=true only changes how RESULTS are delivered — an invalid
    query must still fail as HTTP 400 with the 'kind' field, not as an
    in-band error tail of a 200 NDJSON stream."""
    r = client.post("/datasets/ev/query?stream=true", json={
        "query": {"conditions": [{"filter": ["nope", "==", 1]}]}})
    assert r.status_code == 400
    body = r.get_json()
    assert body["success"] is False
    assert "kind" in body
    assert "Unknown column" in body["errorMessage"]


def test_error_paths(client):
    r = client.post("/datasets/ev/query", json={
        "query": {"conditions": [{"filter": ["nope", "==", 1]}]}})
    assert r.status_code == 400
    assert "Unknown column" in r.get_json()["errorMessage"]

    r = client.post("/datasets/missing/query", json={})
    assert r.status_code == 404

    r = client.post("/datasets/register", json={
        "name": "bad", "basepath": SF_EVENTS,
        "group_id_column": "value", "timestamp_column": "ts"})
    assert r.status_code == 400

    # ev was queried moments ago in this module → force past the guard
    r = client.post("/datasets/ev/unregister?force=true")
    assert r.get_json()["datasetFound"] is True
    assert client.get("/datasets").get_json() == []


def test_stats_fallback_public_tracker_api(spark, monkeypatch):
    """Version-proofing: if the statusStore reflection path breaks (a Spark
    minor bump moving private plumbing), the snapshot must degrade to the
    PUBLIC StatusTracker API — task/stage counts populated, volumes zeroed,
    marked partial — not to an empty ``{"partial": true}`` shell."""
    from pyspark.sql import functions as F

    from funnel_rocket_spark.engine.metrics import JobGroupMetrics

    def boom(self, sc, stage_ids, out):
        raise RuntimeError("simulated: private statusStore plumbing moved")

    monkeypatch.setattr(JobGroupMetrics, "_fill_from_status_store", boom)
    with JobGroupMetrics(spark, "fallback test") as jg:
        spark.range(1000).groupBy((F.col("id") % 7).alias("k")) \
            .count().collect()
        snap = jg.snapshot()
    assert snap["partial"] is True
    assert snap["statsSource"] == "statusTracker"
    assert snap["invoker"]["jobs"] >= 1
    assert snap["invoker"]["stages"] >= 1
    assert snap["invoker"]["totalTasks"] > 0
    assert snap["invoker"]["failedTasks"] == 0
    # volumes are honest zeros on the fallback path, never fabricated
    assert snap["worker"]["scannedBytes"] == 0


def test_prom_registry_exposition():
    """Unit contract of the hand-rolled Prometheus text format: cumulative
    buckets + +Inf + sum/count for histograms, _total counters, per-unit
    bucket selection by name suffix (the reference's MeasuredUnit.unitof)."""
    from funnel_rocket_spark.engine.prom import PromRegistry

    reg = PromRegistry()
    labels = {"dataset": "ev", "success": "true", "type": "query"}
    reg.inc("query_requests_total", labels)
    reg.inc("query_requests_total", labels)
    reg.observe("invoker_total_seconds", labels, 0.3)
    reg.observe("invoker_total_seconds", labels, 7.0)
    text = reg.exposition()
    assert ('query_requests_total{dataset="ev",success="true",type="query"}'
            ' 2') in text
    # seconds buckets: 0.3 lands in le=0.5 and later; 7.0 only in >=10
    assert 'invoker_total_seconds_bucket{dataset="ev",success="true",' \
           'type="query",le="0.5"} 1' in text
    assert 'invoker_total_seconds_bucket{dataset="ev",success="true",' \
           'type="query",le="10"} 2' in text
    assert 'le="+Inf"} 2' in text
    assert 'invoker_total_seconds_sum{dataset="ev",success="true",' \
           'type="query"} 7.3' in text
    assert 'invoker_total_seconds_count{dataset="ev",success="true",' \
           'type="query"} 2' in text
    # unknown unit suffix falls back to the default buckets
    reg.observe("things_other", labels, 3)
    assert 'things_other_bucket{dataset="ev",success="true",' \
           'type="query",le="5"} 1' in reg.exposition()


def test_metrics_endpoint(client):
    """GET /metrics after this module's earlier register + query traffic:
    reference prom_adapter parity — counters and unit-bucketed histograms
    labeled by dataset/success/type."""
    r = client.get("/metrics")
    assert r.status_code == 200
    assert "version=0.0.4" in r.content_type
    text = r.get_data(as_text=True)
    # successful queries were recorded with engine stats folded in
    assert 'query_requests_total{dataset="ev",success="true",type="query"}' \
        in text
    assert "invoker_total_seconds_bucket" in text and 'le="+Inf"' in text
    assert 'scanned_rows_count{dataset="ev",success="true",type="query"}' \
        in text
    assert "cost_dollars_sum" in text
    # registrations carry type="register" (reference JobTypeLabel)
    assert 'type="register"' in text
    # the earlier unknown-column query + bad registration landed as
    # success="false" series
    assert 'success="false"' in text


def test_prom_label_escaping():
    from funnel_rocket_spark.engine.prom import PromRegistry

    reg = PromRegistry()
    reg.inc("query_requests_total",
            {"dataset": 'we"ird\\name\nx', "success": "true"})
    text = reg.exposition()
    assert r'dataset="we\"ird\\name\nx"' in text
