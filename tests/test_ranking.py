"""Per-group top-k / keep-best: unit semantics + the rank-pushdown plan gate
(the catalog query `top_docs_per_lang` covers the DuckDB differential)."""

from pyspark.sql import functions as F

from funnel_rocket_spark.operators import ranking


def _docs(spark):
    rows = [
        ("en", 1, 50), ("en", 2, 90), ("en", 3, 90), ("en", 4, 10),
        ("de", 5, 70), ("de", 6, 30),
    ]
    return spark.createDataFrame(rows, "lang string, doc_id long, n long")


def test_top_k_per_group(spark):
    out = ranking.top_k_per_group(
        _docs(spark), ["lang"], [F.desc("n"), F.asc("doc_id")], k=2)
    got = {(r["lang"], r["rnk"]): r["doc_id"] for r in out.collect()}
    # ties (en docs 2,3 both n=90) break on doc_id — deterministic
    assert got == {("en", 1): 2, ("en", 2): 3, ("de", 1): 5, ("de", 2): 6}


def test_keep_best(spark):
    out = ranking.keep_best(
        _docs(spark), ["lang"], [F.desc("n"), F.asc("doc_id")])
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 5]
    assert "rnk" not in out.columns and "__rnk" not in out.columns


def test_top_k_rank_pushdown_plan(spark):
    """row_number() <= k must compile to a WindowGroupLimit so map tasks trim
    to k rows per group BEFORE the exchange — the property that keeps the
    shuffle at O(groups * k) instead of O(rows) at 100 TB."""
    from funnel_rocket_spark.plans import formatted_plan

    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v"))
    plan = ranking.top_k_per_group(df, ["g"], [F.desc("v")], k=3)
    assert "WindowGroupLimit" in formatted_plan(plan)
