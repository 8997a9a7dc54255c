"""Scale toolkit tests: bucketed joins eliminate the shuffle (plan-proven),
salted aggregation matches direct aggregation on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.operators.scale import (
    co_located_join,
    salted_aggregate,
    write_bucketed,
)
from flink_cdc_connectors_spark.plans import explain_str, shuffle_count
from flink_cdc_connectors_spark.sources.loaders import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key -> sort-merge join with ZERO
    Exchange operators: the storage layout carries the partitioning."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey", 4)
    write_bucketed(customer.withColumnRenamed("c_custkey", "custkey"), "b_customer", "custkey", 4)
    # force the SMJ path (broadcast would trivially have no exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "b_orders", "b_customer", "custkey")
        assert shuffle_count(joined) == 0
        assert "SortMergeJoin" in explain_str(joined, "simple")
        # and the same join on the UNbucketed tables DOES shuffle both sides
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        assert shuffle_count(plain) == 2
        # correctness: same row count either way
        assert joined.count() == plain.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_aggregate_matches_direct(spark, sf_dir):
    """Salted two-stage agg == direct agg, on deliberately skewed data
    (90% of rows share one key)."""
    li = load_table(spark, sf_dir, "lineitem")
    skewed = li.withColumn(
        "k", F.when(F.col("l_orderkey") % 10 != 0, F.lit(0)).otherwise(F.col("l_orderkey"))
    )
    salted = salted_aggregate(
        skewed, ["k"], {"l_quantity": "sum", "l_orderkey": "count"}
    )
    direct = skewed.groupBy("k").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count(F.lit(1)).alias("count_l_orderkey"),
    )
    s = {r["k"]: (round(r["sum_l_quantity"], 4), r["count_l_orderkey"]) for r in salted.collect()}
    d = {r["k"]: (round(r["sum_l_quantity"], 4), r["count_l_orderkey"]) for r in direct.collect()}
    assert s == d and len(s) > 1


def test_salted_aggregate_rejects_non_decomposable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(li, ["l_returnflag"], {"l_quantity": "avg"})


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The salt must actually spread the hot key: the 70%-hot fact key's
    rows land in ~salt_buckets distinct (key, salt) groups with no group
    holding more than ~2x the even share — the property that bounds the
    worst reducer at scale."""
    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.operators.scale import salted_join
    from flink_cdc_connectors_spark.sources.loaders import load_table

    ev = load_table(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("event_id") % 10 < 7, F.lit(1)).otherwise(F.col("user_id")).alias("k"),
        "event_id",
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    buckets = 8
    joined = salted_join(
        fact, dim.hint("merge"), "k", salt_buckets=buckets, salt_from=F.xxhash64("event_id")
    )
    # re-derive the salt the operator used to inspect the distribution
    salted = fact.withColumn("s", F.abs(F.xxhash64("event_id") % buckets).cast("int"))
    hot = salted.filter(F.col("k") == 1).groupBy("s").count().collect()
    n_hot = sum(r["count"] for r in hot)
    assert len(hot) == buckets, "hot key not spread across all salt values"
    even = n_hot / buckets
    assert max(r["count"] for r in hot) < 2 * even
    # and results still equal the plain join
    plain = fact.join(dim, "k").count()
    assert joined.count() == plain


def test_token_count_scale_path_null_text_matches_jvm_form(spark):
    """ADVICE r9: the Arrow-batch tokenizer behind ext_token_count's engine
    gate must yield NULL counts for null text — exactly what the JVM
    ``regexp_extract_all`` form produces (``size(null)`` is null) — instead
    of raising TypeError when NaN reaches ``pat.findall``."""
    import pandas as pd
    from pyspark.sql import functions as F

    from flink_cdc_connectors_spark.queries.tier_c import _token_count_batches

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["Hello, world 42", None, ""]}
    )
    out = pd.concat(list(_token_count_batches([pdf])), ignore_index=True)
    # "hello" "," "world" "42" -> 4 tokens, all distinct; null -> NA; "" -> 0
    assert out["n_tokens"].tolist()[0] == 4
    assert out["n_distinct_tokens"].tolist()[0] == 4
    assert pd.isna(out["n_tokens"][1]) and pd.isna(out["n_distinct_tokens"][1])
    assert out["n_tokens"][2] == 0 and out["n_distinct_tokens"][2] == 0

    # end-to-end through mapInPandas AND vs the JVM gate form on the same
    # null-bearing frame: same rows, nulls in the same places
    df = spark.createDataFrame(pdf)
    batch = df.mapInPandas(
        _token_count_batches, "doc_id long, n_tokens int, n_distinct_tokens int"
    )
    toks = F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    jvm = df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )
    b = {r["doc_id"]: (r["n_tokens"], r["n_distinct_tokens"]) for r in batch.collect()}
    j = {r["doc_id"]: (r["n_tokens"], r["n_distinct_tokens"]) for r in jvm.collect()}
    assert b == j
