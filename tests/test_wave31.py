"""Wave-31 operators: lift/gains on a planted perfectly-ranked outcome,
RFM scores on a hand-built customer ladder, and Apriori triples on
planted baskets with a known frequent triple."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_lift_gains_perfect_ranking(spark, tmp_path):
    # 100 events, values 100..1 (distinct); positives = the 10 highest
    # values -> decile 1 captures ALL positives: gain 1.0, lift 10.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(100):
        v = float(100 - i)
        et = "purchase" if i < 10 else "view"
        rows.append((i, t0, 1, et, v, ""))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["decile"]: r for r in _q("a_lift_gain_curves").spark(spark, str(tmp_path)).collect()}
    assert len(out) == 10
    assert out[1]["n"] == 10 and out[1]["n_pos"] == 10
    assert abs(out[1]["response_rate"] - 1.0) < 1e-9
    assert abs(out[1]["cum_gain"] - 1.0) < 1e-9
    assert abs(out[1]["cum_lift"] - 10.0) < 1e-9
    assert out[5]["n_pos"] == 0
    assert abs(out[10]["cum_gain"] - 1.0) < 1e-9
    assert abs(out[10]["cum_lift"] - 1.0) < 1e-9


def test_rfm_scores_ladder(spark, tmp_path):
    # 10 customers; customer k orders once per day for k+1 days ending
    # at day k (so recency, frequency and monetary all improve with k).
    base = datetime.date(2024, 1, 1)
    orders = []
    ok = 0
    for ck in range(10):
        for j in range(ck + 1):
            orders.append(
                (ok, ck, "O", 100.0 * (ck + 1),
                 base + datetime.timedelta(days=30 * ck + j), "P")
            )
            ok += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = _q("a_rfm_segmentation").spark(spark, str(tmp_path)).collect()
    total = sum(r["n_customers"] for r in out)
    assert total == 10
    # customers 8 and 9 (most recent, most frequent, most monetary)
    # land in the champions cell (r=5, f>=4).
    champ = [r for r in out if r["segment"] == "champions"]
    assert sum(r["n_customers"] for r in champ) == 2
    # customers 0-3 (two lowest r and f quintiles) -> hibernating
    hib = [r for r in out if r["segment"] == "hibernating"]
    assert sum(r["n_customers"] for r in hib) == 4
    for r in out:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_apriori_planted_triple(spark, tmp_path):
    # 20 baskets contain {B1,B2,B3}; 100 noise baskets contain a single
    # distinct brand each -> the only frequent pair/triple structure is
    # the planted one (minsup = max(2, 0.5% of 120) = 2).
    li, part = [], []
    pk = 0
    brands = {}

    def brand_key(name):
        nonlocal pk
        if name not in brands:
            brands[name] = pk
            part.append((pk, f"part{pk}", name, "T", 1, 1.0))
            pk += 1
        return brands[name]

    rows = []
    lk = 0
    for oid in range(20):
        for name in ("B1", "B2", "B3"):
            rows.append((oid, brand_key(name), 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         datetime.datetime(2024, 1, 1)))
            lk += 1
    for oid in range(20, 120):
        nm = f"N{oid}"
        rows.append((oid, brand_key(nm), 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     datetime.datetime(2024, 1, 1)))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        part,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = _q("a_apriori_triples").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["item_c"]) == ("B1", "B2", "B3")
    assert r["support"] == 20
    assert r["n_baskets"] == 120
    assert abs(r["support_frac"] - 20.0 / 120.0) < 1e-6
