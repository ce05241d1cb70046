"""Expectations: each check counts exactly the planted violations."""

from pyspark.sql import functions as F  # noqa: F401

from cicevse2024_tfm_datapipeline_spark.operators.expectations import (
    check_accepted_values,
    check_in_range,
    check_not_null,
    check_referential,
    check_unique,
    run_checks,
)


def test_checks_count_planted_violations(spark):
    child = spark.createDataFrame(
        [(1, "a", 0.5, 10), (1, "b", 1.5, 20), (2, None, -0.5, 30), (3, "c", None, 99)],
        "k long, v string, x double, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")

    report = {
        r["check"]: (r["n_checked"], r["n_violations"])
        for r in run_checks(
            [
                check_unique(child, ["k"]),          # k=1 twice -> 1 extra row
                check_not_null(child, "v"),           # one null
                check_in_range(child, "x", 0.0, 1.0), # 1.5, -0.5, null -> 3
                check_accepted_values(child, "v", ["a", "b"]),  # 'c' + null -> 2
                check_referential(child, parent, "fk", "pk"),   # 99 orphan
            ]
        ).collect()
    }
    assert report["unique(k)"] == (4, 1)
    assert report["not_null(v)"] == (4, 1)
    assert report["range(x in [0.0, 1.0])"] == (4, 3)
    assert report["accepted_values(v)"] == (4, 2)
    assert report["referential(fk -> pk)"] == (4, 1)


def test_clean_data_reports_zero_violations(spark):
    df = spark.createDataFrame([(1, "a", 0.1), (2, "b", 0.9)], "k long, v string, x double")
    rep = run_checks(
        [
            check_unique(df, ["k"]),
            check_not_null(df, "v"),
            check_in_range(df, "x", 0.0, 1.0),
            check_accepted_values(df, "v", ["a", "b"]),
        ]
    )
    assert rep.filter(F.col("n_violations") > 0).count() == 0
