"""Wave-15 operators: binary-segmentation prefix-sum identity vs a
direct sub-series CUSUM, Zipf slope vs a NumPy mirror, centroid
cosines vs NumPy, and the seasonal-naive day-key join semantics."""

import datetime

import numpy as np

SF = "/root/testdata/sf0.001"


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_binary_segmentation_matches_bruteforce(spark, tmp_path):
    # one user, three regimes: the root split and both child splits are
    # recovered by brute force over the SUB-SERIES (not the prefix-sum
    # shortcut), proving the segment-statistic identity
    t0 = datetime.datetime(2024, 1, 1)
    vals = [10.0] * 15 + [200.0] * 15 + [50.0] * 15
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "view", vals[i], "{}")
        for i in range(len(vals))
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["level"]: r
        for r in _q("a_binary_segmentation").spark(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"root", "left", "right"}

    ticks = [int(np.floor(v * 10000 + 0.5)) for v in vals]
    n = len(ticks)
    S = np.cumsum(ticks)
    T = int(S[-1])

    def argmax_cusum(lo, hi):
        """Brute-force CUSUM on the sub-series (lo, hi] alone, candidate
        interior points; returns (0-based index, score)."""
        m = hi - lo
        base = S[lo - 1] if lo >= 1 else 0
        tot = int(S[hi - 1] - base)
        best = None
        for j in range(1, m):  # interior of the segment
            i = lo + j  # 1-based global index
            pj = int(S[i - 1] - base)
            score = abs(m * pj - j * tot)
            if best is None or score > best[1]:
                best = (i, score)
        return best

    k1, root_score = argmax_cusum(0, n)
    assert out["root"]["changepoint_event_id"] == k1 - 1  # event_id = i-1
    assert out["root"]["score_ticks"] == root_score
    kl, left_score = argmax_cusum(0, k1)
    assert out["left"]["changepoint_event_id"] == kl - 1
    assert out["left"]["score_ticks"] == left_score
    kr, right_score = argmax_cusum(k1, n)
    assert out["right"]["changepoint_event_id"] == kr - 1
    assert out["right"]["score_ticks"] == right_score
    # sanity: the regime boundaries are where they were planted
    assert k1 - 1 in (14, 15, 29, 30)


def test_zipf_slope_matches_numpy_mirror(spark):
    import duckdb

    row = _q("text_zipf_slope").spark(spark, SF).collect()[0]
    freqs = [
        f
        for (f,) in duckdb.sql(
            "SELECT count(*) AS f FROM (SELECT unnest(list_filter("
            "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term "
            f"FROM '{SF}/documents.parquet') GROUP BY term "
            "ORDER BY f DESC LIMIT 1000"
        ).fetchall()
    ]
    x = np.log(np.arange(1, len(freqs) + 1))
    y = np.log(np.array(freqs, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert row["n_terms"] == len(freqs)
    # tick rounding at 1e-4 on each ln value bounds the OLS drift
    assert abs(row["slope"] - slope) < 1e-3
    assert abs(row["intercept_ln"] - intercept) < 1e-3
    assert 0.0 <= row["r2"] <= 1.0
    assert row["slope"] < 0  # frequency decreases with rank


def test_centroid_cosine_matches_numpy(spark):
    import duckdb

    out = _q("sim_label_centroid_cosine").spark(spark, SF).collect()
    assert len(out) == 45
    rows = duckdb.sql(
        f"SELECT label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    sums = {}
    for lab, emb in rows:
        t = np.floor(np.asarray(emb, dtype=np.float64) * 10000 + 0.5)
        sums[lab] = sums.get(lab, 0) + t
    for r in out:
        va, vb = sums[r["label_a"]], sums[r["label_b"]]
        expect = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(r["cosine"] - expect) < 1e-5
        assert -1.0 <= r["cosine"] <= 1.0
        assert r["label_a"] < r["label_b"]


def test_seasonal_naive_day_key_join_skips_gaps(spark, tmp_path):
    # days 0..6 and day 14 have events; day 14's season lag (day 7) is
    # absent, so a day-key join must NOT pair it with day 6 (a row-lag
    # window would)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    counts = [(0, 5), (1, 5), (2, 3), (7, 7), (8, 2), (14, 9), (16, 4)]
    for day, cnt in counts:
        for _ in range(cnt):
            rows.append(
                (eid, t0 + datetime.timedelta(days=day, minutes=eid % 60), 1, "view", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = _q("w_seasonal_naive_backtest").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # pairable: day 7 <- day 0 (|7-5|=2), day 8 <- day 1 (|2-5|=3),
    # day 14 <- day 7 (|9-7|=2). Days 2 and 16 lag to ABSENT days 9 and
    # -5 — a row-lag window would have mispaired them; the day-key join
    # drops them
    assert r["n_days"] == 3
    assert r["total_abs_err"] == 7
    assert abs(r["mae"] - 7 / 3) < 1e-6
    assert abs(r["wape"] - 7 / 18) < 1e-6
