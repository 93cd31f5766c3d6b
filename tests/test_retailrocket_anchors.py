"""End-to-end golden anchors, RetailRocket-shaped.

The reference's example-dataset walkthrough publishes exact result counts
for a fixed query progression over the RetailRocket dataset (BASELINE.md
"correctness anchors": transaction count>=1, count>1/==1/==0, same-row
price AND, sum target, two-condition AND, view->addtocart->transaction
sequence, per-step funnel — reference docs/example-dataset.md:307-552).
That dataset is 2.5M rows and not vendored, so this suite rebuilds the
SHAPE at 1/1000 scale: a synthetic events table whose per-user patterns
are fixed by construction, giving hand-computable goldens for the same
eight query shapes. Every query runs through the full service path —
HTTP register -> catalog -> engine -> JSON — exactly like the walkthrough
drives the reference.

Fixture construction (user id ranges):
  0..99    view(t1) -> addtocart(t2) -> transaction(t3, price 60)
  100..149 view(t1) -> transaction(t2, price 10) -> transaction(t4, price 30)
  150..299 view(t1) -> addtocart(t2)
  300..999 view(t1)
"""

import pytest

from funnel_rocket_spark.api import create_app

N_USERS = 1_000


def _fixture_rows():
    rows = []
    for u in range(N_USERS):
        rows.append((u, 1, "view", None))
        if u < 100:
            rows.append((u, 2, "addtocart", None))
            rows.append((u, 3, "transaction", 60.0))
        elif u < 150:
            rows.append((u, 2, "transaction", 10.0))
            rows.append((u, 4, "transaction", 30.0))
        elif u < 300:
            rows.append((u, 2, "addtocart", None))
    return rows


TOTAL_ROWS = 1000 + 100 * 2 + 50 * 2 + 150 * 1  # 1_550


@pytest.fixture(scope="module")
def rr(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("retailrocket_shaped")
    data = str(base / "events")
    spark.createDataFrame(
        _fixture_rows(),
        "user_id long, ts long, event_type string, price double",
    ).coalesce(2).write.parquet(data)

    app = create_app(spark=spark, catalog_dir=str(base / "catalog"))
    app.config["TESTING"] = True
    with app.test_client() as client:
        r = client.post("/datasets/register", json={
            "name": "rr", "basepath": data,
            "group_id_column": "user_id", "timestamp_column": "ts"})
        assert r.status_code == 200 and r.get_json()["success"]
        assert r.get_json()["dataset"]["totalRows"] == TOTAL_ROWS
        yield client


def _query(rr, body):
    r = rr.post("/datasets/rr/query", json=body)
    assert r.status_code == 200, r.get_data(as_text=True)
    return r.get_json()


def test_empty_query_totals(rr):
    # walkthrough: empty query returns the full universe
    res = _query(rr, {})
    assert res["query"]["matchingGroups"] == N_USERS
    assert res["query"]["matchingGroupRows"] == TOTAL_ROWS


def test_transaction_count_ge_1(rr):
    # anchor analogue of 11,569 groups / 218,927 rows
    res = _query(rr, {"query": {"conditions": [
        {"filter": ["event_type", "==", "transaction"],
         "target": ["count", ">=", 1]}]}})
    assert res["query"]["matchingGroups"] == 150
    # all rows of matching groups: 100 users x3 + 50 users x3
    assert res["query"]["matchingGroupRows"] == 450


def test_transaction_count_partitions(rr):
    # anchor analogue of 2,528 / 9,041 / 1,224,463 — and the three buckets
    # must partition the universe exactly
    gt1 = _query(rr, {"query": {"conditions": [
        {"filter": ["event_type", "==", "transaction"],
         "target": ["count", ">", 1]}]}})
    eq1 = _query(rr, {"query": {"conditions": [
        {"filter": ["event_type", "==", "transaction"],
         "target": ["count", "==", 1]}]}})
    eq0 = _query(rr, {"query": {"conditions": [
        {"filter": ["event_type", "==", "transaction"],
         "target": ["count", "==", 0]}]}})
    assert gt1["query"]["matchingGroups"] == 50
    assert eq1["query"]["matchingGroups"] == 100
    assert eq0["query"]["matchingGroups"] == 850
    assert (gt1["query"]["matchingGroups"] + eq1["query"]["matchingGroups"]
            + eq0["query"]["matchingGroups"]) == N_USERS


def test_same_row_price_conjunction(rr):
    # anchor analogue of 6,097: transaction AND price >= 50 on the SAME row
    # (users 100..149 have transactions and total spend 40 — price never
    # reaches 50 on one row)
    res = _query(rr, {"query": {"conditions": [
        {"filters": [
            {"column": "event_type", "op": "==", "value": "transaction"},
            {"column": "price", "op": ">=", "value": 50.0}],
         "target": ["count", ">=", 1]}]}})
    assert res["query"]["matchingGroups"] == 100


def test_sum_price_target(rr):
    # anchor analogue of 6,505: sum(price) >= 50 over transaction rows —
    # users 100..149 sum to 40 and drop out
    res = _query(rr, {"query": {"conditions": [
        {"filter": ["event_type", "==", "transaction"],
         "target": ["sum", "price", ">=", 50.0]}]}})
    assert res["query"]["matchingGroups"] == 100


def test_two_condition_and(rr):
    # anchor analogue of the 408 delta query: transaction>=1 AND addtocart>=1
    res = _query(rr, {"query": {"conditions": [
        {"filter": ["event_type", "==", "transaction"]},
        {"filter": ["event_type", "==", "addtocart"]}]}})
    assert res["query"]["matchingGroups"] == 100


def test_sequence_anchor(rr):
    # anchor analogue of 9,830: the strict view -> addtocart -> transaction
    # chain only completes for users 0..99 (ts 1 < 2 < 3)
    res = _query(rr, {"query": {"conditions": [{"sequence": [
        {"filter": ["event_type", "==", "view"]},
        {"filter": ["event_type", "==", "addtocart"]},
        {"filter": ["event_type", "==", "transaction"]}]}]}})
    assert res["query"]["matchingGroups"] == 100


def test_funnel_per_step_counts(rr):
    # anchor analogue of 1,232,600 / 32,553 / 9,830 per-step groups
    res = _query(rr, {"funnel": {"sequence": [
        {"filter": ["event_type", "==", "view"]},
        {"filter": ["event_type", "==", "addtocart"]},
        {"filter": ["event_type", "==", "transaction"]}]}})
    steps = res["funnel"]["sequence"]
    assert [s["matchingGroups"] for s in steps] == [1000, 250, 100]
