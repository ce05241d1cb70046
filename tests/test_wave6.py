"""Wave-6 operators: trending lift smoothing, posting-list content,
bitmap audience algebra, interval-union coverage."""

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_trending_laplace_smoothing_and_order(spark, tmp_path):
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    d96 = datetime.datetime(1996, 6, 1)
    d97 = datetime.datetime(1997, 6, 1)
    rows = []
    i = 0

    def add(key, when, n):
        nonlocal i
        for _ in range(n):
            rows.append((i, key, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", when))
            i += 1

    add(1, d96, 10); add(1, d97, 10)   # flat: lift (10+1)/(10+1) = 1
    add(2, d97, 5)                      # new key: lift (5+1)/(0+1) = 6
    add(3, d96, 2); add(3, d97, 8)     # riser: lift 9/3 = 3
    add(4, d96, 8)                      # faller: lift 1/9
    spark.createDataFrame(rows, li_schema).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = [(r["l_partkey"], r["lift"]) for r in _q("a_trending_keys").spark(spark, str(tmp_path)).collect()]
    assert out[0][0] == 2 and abs(out[0][1] - 6.0) < 1e-9
    assert out[1][0] == 3 and abs(out[1][1] - 3.0) < 1e-9
    assert out[2][0] == 1 and abs(out[2][1] - 1.0) < 1e-9


def test_inverted_index_posting_order_and_tf(spark, tmp_path):
    docs = [
        (3, "cat dog cat"),
        (1, "cat mouse"),
        (2, "dog dog dog"),
        (4, "cat"),
        (5, "cat"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {r["term"]: r for r in _q("text_inverted_index").spark(spark, str(tmp_path)).collect()}
    # only 'cat' reaches df >= 5? no: cat df=4. Lower the bar by checking
    # raw index before the filter via a direct rebuild is overkill — use
    # enough docs for cat to clear df >= 5
    assert got == {}  # nothing has df >= 5 with 4 docs containing 'cat'

    docs += [(6, "cat")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {r["term"]: r for r in _q("text_inverted_index").spark(spark, str(tmp_path)).collect()}
    assert set(got) == {"cat"}
    r = got["cat"]
    assert r["df"] == 5 and r["total_tf"] == 6
    assert r["postings"] == "1:1,3:2,4:1,5:1,6:1"  # sorted by doc_id, tf embedded


def test_bitmap_intersection_exact_vs_direct(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    # users straddling the 32-block boundary: 31, 32, 33; plus 0 and 100
    viewers = [0, 31, 32, 33, 100]
    buyers = [31, 33, 100, 7]
    rows = []
    i = 0
    for u in viewers:
        rows.append((i, t0, u, "view", 1.0, "{}")); i += 1
    for u in buyers:
        rows.append((i, t0, u, "purchase", 1.0, "{}")); i += 1
    _write_events(spark, tmp_path, rows)
    r = _q("a_bitmap_intersection").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_view"] == 5 and r["n_purchase"] == 4
    assert r["n_both"] == len(set(viewers) & set(buyers))  # 3
    assert abs(r["audience_jaccard"] - 3 / 6) < 1e-9


def test_interval_coverage_merge_semantics(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    rows = [
        # user 1: events at 0s and 30s overlap (60s windows) -> one island
        #   covering [0, 90s); event at 300s is disjoint -> second island
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + 30 * s, 1, "view", 1.0, "{}"),
        (2, t0 + 300 * s, 1, "view", 1.0, "{}"),
        # user 2: adjacent (end == next start) merges: [0,60) + [60,120)
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 + 60 * s, 2, "view", 1.0, "{}"),
        # user 3: two events at the SAME instant -> one island of 60s
        (5, t0, 3, "view", 1.0, "{}"),
        (6, t0, 3, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {r["user_id"]: r for r in _q("w_interval_coverage").spark(spark, str(tmp_path)).collect()}
    assert got[1]["n_islands"] == 2
    assert got[1]["covered_us"] == (90 + 60) * 1_000_000
    # s > prev_max_e is strict: touching intervals merge
    assert got[2]["n_islands"] == 1
    assert got[2]["covered_us"] == 120 * 1_000_000
    assert got[3]["n_islands"] == 1
    assert got[3]["covered_us"] == 60 * 1_000_000
