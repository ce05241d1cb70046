"""Wave-4 operators: prefix-filter similarity join losslessness, BFS
levels, Benford digit extraction, exact-integer CUSUM, RRF fusion."""

from itertools import combinations

from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.graph import bfs_levels, undirect


def test_bfs_levels_known_graph(spark):
    # path 0-1-2-3-4 plus a chord 1-3; detached edge 10-11 unreachable
    e = undirect(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3), (10, 11)],
            "doc_a long, doc_b long",
        )
    )
    seed = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["level"] for r in bfs_levels(e, seed, max_depth=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 3}  # chord shortens 3; 10/11 absent


def test_bfs_depth_bound_truncates(spark):
    e = undirect(
        spark.createDataFrame([(i, i + 1) for i in range(6)], "doc_a long, doc_b long")
    )
    seed = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["level"] for r in bfs_levels(e, seed, max_depth=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def _brute_jaccard_pairs(docs, k=3, tau=0.5):
    """All pairs with shingle-set Jaccard >= tau, by direct computation."""
    sets = {}
    for doc_id, text in docs:
        toks = [t for t in text.split() if t]
        sets[doc_id] = {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
    out = {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        un = len(sa | sb)
        if un and inter / un >= tau:
            out[(a, b)] = inter / un
    return out


def test_prefix_filter_is_lossless_vs_bruteforce(spark, tmp_path, monkeypatch):
    # near-dup pairs at several overlap levels + unrelated docs: the
    # prefix filter must find EXACTLY the >= 0.5 pairs brute force finds
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta IOTA"),  # near-dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (4, "one two three four five six seven eight nine ten"),
        (5, "one two three four five six seven XXX YYY ZZZ"),  # partial of 4
        (6, "totally different words with no overlap here at all"),
        (7, "tiny doc"),  # < k tokens -> empty set, must not crash
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    q = load_all()["dedup_prefix_filter_jaccard"]
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q.spark(spark, str(tmp_path)).collect()
    }
    want = _brute_jaccard_pairs(docs)
    assert set(got) == set(want)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-6
    assert got[(1, 3)] == 1.0  # exact dup


def test_cusum_exact_on_step_series(spark, tmp_path):
    # 20 zeros then 20 tens: CUSUM |S_i| peaks exactly at the boundary
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, i), 7, "view", 0.0 if i < 20 else 10.0, "{}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    out = load_all()["a_cusum_changepoint"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 40
    assert r["changepoint_event_id"] == 19  # last row before the step
    # mean = 5.0; S_19 = sum of 20 * (0 - 5) = -100 -> |S| = 100
    assert abs(r["max_abs_cusum"] - 100.0) < 1e-6


def test_benford_digit_from_cents_string(spark, tmp_path):
    import datetime

    prices = [999.995, 1.0, 0.004, 95000.0, 10.0]  # 999.995 rounds to 100000 cents -> digit 1
    rows = [
        (i, i, "O", p, datetime.datetime(2024, 1, 1), "LOW") for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    got = {
        r["digit"]: r["n"]
        for r in load_all()["a_benford_first_digit"].spark(spark, str(tmp_path)).collect()
    }
    # cents: 100000(d1), 100(d1), 0 -> excluded? 0.004*100+0.5 -> floor(0.9)=0 -> digit 0
    # 9500000(d9), 1000(d1)
    assert got[1] == 3
    assert got[9] == 1
    assert got.get(0, 0) == 1  # sub-cent price collapses to digit 0, kept visible


def test_referential_integrity_counts_injected_orphans(spark, tmp_path):
    import datetime

    spark.createDataFrame(
        [(1, 1, "O", 10.0, datetime.datetime(2024, 1, 1), "LOW"),
         (2, 99, "O", 10.0, datetime.datetime(2024, 1, 1), "LOW")],  # custkey 99 orphan
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "c1", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime.datetime(2024, 1, 2)),
         (7, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime.datetime(2024, 1, 2))],
        li_schema,
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "p", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [(1, "s", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    got = {
        r["check_name"]: r["n_orphans"]
        for r in load_all()["a_referential_integrity"].spark(spark, str(tmp_path)).collect()
    }
    assert got == {
        "lineitem->orders": 1,  # orderkey 7
        "lineitem->part": 0,
        "lineitem->supplier": 0,
        "orders->customer": 1,  # custkey 99
    }


def test_rrf_fusion_ranks_and_ties(spark, tmp_path):
    docs = [
        (1, "a b c d e f g h"),          # longest, diversity 1.0
        (2, "a a a a a a a"),            # long, diversity 1/7
        (3, "x y z"),                    # short, diversity 1.0
        (4, "p q"),                      # shortest
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    rows = {r["doc_id"]: r for r in load_all()["sim_rrf_fusion"].spark(spark, str(tmp_path)).collect()}
    assert rows[1]["r_len"] == 1  # 8 tokens, longest
    # diversity ranking: 1.0 ties broken by doc_id DESC -> 3 before 1
    assert rows[3]["r_div"] < rows[1]["r_div"]
    assert rows[2]["r_div"] == 4  # lowest diversity
    # fused: doc 1 wins overall (rank 1 + rank 2)
    best = max(rows.values(), key=lambda r: r["rrf_score"])
    assert best["doc_id"] == 1
