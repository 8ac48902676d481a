"""Round-16 optimization equivalence pins: every restructure that
changed an operator's internals must compute EXACTLY what the old
shape computed (the oracle gate checks vs DuckDB; these tests pin the
Spark-side equivalence claims the restructures rest on, on synthetic
inputs that do not need fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_triangle_pair_generation_equals_self_join(spark):
    """graph.py r16: ordered supplier pairs via sort_array(collect_set)
    + combinations explode ≡ the (a.c = b.c AND a.s < b.s) self-join
    over the distinct incidence list."""
    rows = [(c, (c * 7 + k * 13) % 23) for c in range(40) for k in range(c % 9)]
    base = spark.createDataFrame(rows, "c int, s int").distinct()

    a, b = base.alias("a"), base.alias("b")
    joined = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count("*").alias("n_shared"))
    )
    ss = base.groupBy("c").agg(F.sort_array(F.collect_set("s")).alias("ss"))
    pair_arr = F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), y -> struct(x AS u, y AS v))))"
    )
    exploded = (
        ss.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count("*").alias("n_shared"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, exploded.collect())
    )


def test_hll_sketch_is_insertion_idempotent(spark):
    """relational.py r16 (agg_approx_sketches): approx_count_distinct
    over the DEDUPED key set returns the same estimate as over the raw
    multiset — the HLL register state depends only on the distinct
    hashed values, so the split plan cannot change the sketch verdict."""
    df = spark.range(0, 5000).select((F.col("id") % 437).alias("k"))
    raw = df.agg(F.approx_count_distinct("k")).collect()[0][0]
    dedup = df.distinct().agg(F.approx_count_distinct("k")).collect()[0][0]
    assert raw == dedup


def test_profile_split_distincts_match_single_agg(spark):
    """expectations.py r16 (profile_orders_columns): per-column
    countDistinct subtrees + broadcast crossJoins ≡ the old
    five-distincts-in-one-agg (which paid a 6x Expand + sort chain)."""
    df = spark.createDataFrame(
        [(i % 7, str(i % 11), float(i % 5) if i % 13 else None) for i in range(300)],
        "a int, b string, c double",
    )
    cols = ["a", "b", "c"]
    old = df.agg(
        F.count("*").alias("n_rows"),
        *[F.countDistinct(c).alias(f"nd_{c}") for c in cols],
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.min(c).cast("string").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("string").alias(f"mx_{c}") for c in cols],
    )
    new = df.agg(
        F.count("*").alias("n_rows"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.min(c).cast("string").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("string").alias(f"mx_{c}") for c in cols],
    )
    for c in cols:
        new = new.crossJoin(
            F.broadcast(df.agg(F.countDistinct(c).alias(f"nd_{c}")))
        )
    o, n = old.collect()[0].asDict(), new.collect()[0].asDict()
    assert o == n


def test_dsir_merged_weight_counts_match_three_aggregates(spark):
    """dsir.py r16: ONE groupBy(b) pass with a conditional sum (+ a
    window for totals) ≡ the old rcounts/tcounts(left join + fill 0)/
    totals triple."""
    rows = [(i, i % 3 == 0, (i * 17) % 16) for i in range(500)]
    bt = spark.createDataFrame(rows, "doc_id long, is_t boolean, b int")

    rcounts = bt.groupBy("b").agg(F.count("*").cast("long").alias("rc"))
    tcounts = bt.filter("is_t").groupBy("b").agg(
        F.count("*").cast("long").alias("tc")
    )
    old = (
        rcounts.join(tcounts, "b", "left")
        .na.fill({"tc": 0})
        .crossJoin(
            bt.agg(
                F.sum(F.when(F.col("is_t"), 1).otherwise(0))
                .cast("long").alias("tcnt"),
                F.count("*").cast("long").alias("rcnt"),
            )
        )
    )
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    new = bt.groupBy("b").agg(
        F.count("*").cast("long").alias("rc"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("long").alias("tc"),
    ).select(
        "b", "rc", "tc",
        F.sum("tc").over(w_all).cast("long").alias("tcnt"),
        F.sum("rc").over(w_all).cast("long").alias("rcnt"),
    )
    assert sorted(map(tuple, old.select("b", "rc", "tc", "tcnt", "rcnt").collect())) \
        == sorted(map(tuple, new.collect()))
