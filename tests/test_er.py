"""operators/er.py: blocked Levenshtein entity-resolution pairs (oracle
parity for er_customer_pairs lives in test_oracle_parity.py)."""


def _pairs(spark, rows, max_dist=2, block=("blk",)):
    from duckdb_routing_spark.operators.er import blocked_levenshtein_pairs

    df = spark.createDataFrame(rows, "id long, name string, blk string")
    out = blocked_levenshtein_pairs(df, "id", "name", list(block), max_dist=max_dist)
    return {(r.id_a, r.id_b): r.dist for r in out.collect()}


def test_matches_within_block_only(spark):
    got = _pairs(
        spark,
        [(1, "smith", "a"), (2, "smyth", "a"), (3, "smith", "b")],
    )
    # 1-2 match in block a (dist 1); 1-3 identical names but different blocks
    assert got == {(1, 2): 1}


def test_distance_threshold_and_ordering(spark):
    got = _pairs(
        spark,
        [(5, "jonathan", "a"), (4, "jonatan", "a"), (6, "bob", "a")],
        max_dist=1,
    )
    # pair always emitted (smaller id, larger id); bob is > 1 edit from both
    assert got == {(4, 5): 1}


def test_identical_names_distance_zero(spark):
    got = _pairs(spark, [(1, "acme", "a"), (2, "acme", "a")])
    assert got == {(1, 2): 0}


def test_multi_column_blocking(spark):
    from duckdb_routing_spark.operators.er import blocked_levenshtein_pairs

    df = spark.createDataFrame(
        [(1, "acme", "us", "x"), (2, "acme", "us", "y"), (3, "acme", "us", "x")],
        "id long, name string, country string, seg string",
    )
    out = blocked_levenshtein_pairs(df, "id", "name", ["country", "seg"]).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 3)}
