"""asof_join / range_join (operators/temporal.py): randomized parity
with DuckDB's native ASOF JOIN (backward and forward), tolerance
nulling, and plan shape — the whole point of the union-and-window form
is that Catalyst never falls back to a nested-loop join."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gene_etl_spark.operators.temporal import asof_join, range_join


def _corpora(seed=13, n_left=400, n_right=150, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 1000, n_left).astype("int64"),
            "lval": rng.integers(0, 10**6, n_left),
        }
    )
    # unique (k, t) on the right: equal-time right duplicates are
    # documented as caller-dedup territory (same contract as merge).
    # ~20% of rval is genuinely NULL, and a second non-null column rtag
    # rides along: a per-column (non-atomic) fill would skip the NULL
    # rval back to an older row and pair it with the newer rtag.
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, n_keys, n_right),
                "t": rng.integers(0, 1000, n_right).astype("int64"),
                "rval": rng.integers(0, 10**6, n_right).astype("object"),
            }
        )
        .drop_duplicates(["k", "t"])
        .reset_index(drop=True)
    )
    right.loc[rng.random(len(right)) < 0.2, "rval"] = None
    right["rval"] = right["rval"].map(lambda v: None if v is None else float(v))
    right["rtag"] = [f"r{i}" for i in range(len(right))]
    return left, right


def _spark_right(spark, right):
    rows = [
        (int(k), int(t), None if v is None else float(v), s)
        for k, t, v, s in right.itertuples(index=False)
    ]
    return spark.createDataFrame(rows, "k long, t long, rval double, rtag string")


def _duck_asof(left, right, op):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql(
        f"""
        select l.k, l.t, l.lval, r.rval as rval, r.rtag as rtag, r.t as matched
        from l asof left join r on l.k = r.k and l.t {op} r.t
        order by l.k, l.t, l.lval
        """
    ).df()


def _sorted(df):
    return df.sort_values(["k", "t", "lval"]).reset_index(drop=True)


@pytest.mark.parametrize("direction,op", [("backward", ">="), ("forward", "<=")])
def test_asof_parity_with_duckdb(spark, direction, op):
    left, right = _corpora()
    out = asof_join(
        spark.createDataFrame(left),
        _spark_right(spark, right),
        on="t",
        by="k",
        direction=direction,
    ).toPandas()
    out = _sorted(out).rename(columns={"__asof_t_right": "matched"})
    exp = _sorted(_duck_asof(left, right, op))
    assert len(out) == len(left)
    for col in ("rval", "matched"):
        pd.testing.assert_series_equal(
            out[col].astype("float64"), exp[col].astype("float64"), check_names=False
        )
    # rtag must come from the SAME right row as rval/matched — a
    # per-column fill would mix rows whenever rval is NULL mid-series
    assert out["rtag"].fillna("∅").tolist() == exp["rtag"].fillna("∅").tolist()


def test_asof_equal_time_is_inclusive_and_suffix_applies(spark):
    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, v string")
    right = spark.createDataFrame([(1, 100, "R")], "k long, t long, v string")
    for direction in ("backward", "forward"):
        row = asof_join(left, right, on="t", by="k", direction=direction).collect()[0]
        assert row["v"] == "L" and row["v_right"] == "R"  # collision renamed
        assert row["__asof_t_right"] == 100


def test_asof_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 500)], "k long, t long"
    )
    right = spark.createDataFrame([(1, 90, 7.0)], "k long, t long, rv double")
    out = {
        r["t"]: (r["rv"], r["__asof_t_right"])
        for r in asof_join(
            left, right, on="t", by="k", tolerance=50
        ).collect()
    }
    assert out[100] == (7.0, 90)
    assert out[200] == (None, None)  # 110 > tolerance
    assert out[500] == (None, None)


def test_asof_unmatched_left_rows_survive_with_nulls(spark):
    left = spark.createDataFrame([(1, 5), (2, 50)], "k long, t long")
    right = spark.createDataFrame([(1, 10, 1.0)], "k long, t long, rv double")
    rows = {r["k"]: r for r in asof_join(left, right, on="t", by="k").collect()}
    assert rows[1]["rv"] is None  # right row is in the future
    assert rows[2]["rv"] is None  # key absent entirely
    fwd = {
        r["k"]: r
        for r in asof_join(left, right, on="t", by="k", direction="forward").collect()
    }
    assert fwd[1]["rv"] == 1.0 and fwd[2]["rv"] is None


def test_asof_null_on_rows_never_match(spark):
    left = spark.createDataFrame(
        [(1, 25), (1, 5), (1, None), (2, 50)], "k long, t long"
    )
    right = spark.createDataFrame(
        [
            (1, 10, 5.0, "a"),
            (1, 20, None, "b"),  # true backward match for t=25: NULL rval
            (1, None, 9.0, "z"),  # null event time: never a match
            (2, None, 1.0, "y"),
        ],
        "k long, t long, rval double, rtag string",
    )
    out = {
        (r["k"], r["t"]): r for r in asof_join(left, right, on="t", by="k").collect()
    }
    row = out[(1, 25)]  # atomic match: legit-NULL rval, rtag from SAME row
    assert row["rval"] is None and row["rtag"] == "b"
    assert row["__asof_t_right"] == 20
    assert out[(1, 5)]["rtag"] is None  # nothing at-or-before t=5
    assert out[(1, None)]["rtag"] is None  # null left time: unmatched
    assert out[(2, 50)]["rtag"] is None  # only a null-time right row
    fwd = {
        (r["k"], r["t"]): r
        for r in asof_join(left, right, on="t", by="k", direction="forward").collect()
    }
    assert fwd[(1, 5)]["rtag"] == "a"
    assert fwd[(1, None)]["rtag"] is None
    assert fwd[(1, 25)]["rtag"] is None and fwd[(2, 50)]["rtag"] is None


def test_asof_plan_has_no_nested_loop(spark):
    left, right = _corpora()
    plan = (
        asof_join(
            spark.createDataFrame(left), _spark_right(spark, right), on="t", by="k"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_asof_validation_errors(spark):
    left = spark.createDataFrame([(1, 2)], "k long, t long")
    right = spark.createDataFrame([(1, 2, 3.0)], "k long, t long, rv double")
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on="t", direction="nearest")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(left, right, on="missing")
    with pytest.raises(ValueError, match="no payload"):
        asof_join(left, right.select("k", "t"), on="t", by="k")
    with pytest.raises(ValueError, match="cannot also"):
        asof_join(left, right, on="t", by="t")


def test_range_join_parity_with_duckdb(spark):
    rng = np.random.default_rng(29)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "x": rng.integers(0, 10_000, 300).astype("int64"),
            "pid": np.arange(300),
        }
    )
    lo = rng.integers(0, 9_000, 80).astype("int64")
    iv = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "lo": lo,
            "hi": lo + rng.integers(-50, 2_000, 80),  # some inverted
            "iid": np.arange(80),
        }
    )
    out = range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        point_col="x",
        lo_col="lo",
        hi_col="hi",
        by="k",
        grid=500,
    ).toPandas()
    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", iv)
    exp = con.sql(
        "select pid, iid from p join i on p.k = i.k and p.x between i.lo and i.hi"
    ).df()
    got = set(zip(out["pid"], out["iid"]))
    want = set(zip(exp["pid"], exp["iid"]))
    assert got == want and len(out) == len(want)  # no duplicate pairs


def test_range_join_plan_and_errors(spark):
    pts = spark.createDataFrame([(1, 5, 1)], "k long, x long, pid long")
    iv = spark.createDataFrame([(1, 0, 10, 1)], "k long, lo long, hi long, iid long")
    plan = (
        range_join(pts, iv, "x", "lo", "hi", by="k", grid=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    with pytest.raises(ValueError, match="grid"):
        range_join(pts, iv, "x", "lo", "hi", by="k", grid=0)
    with pytest.raises(ValueError, match="overlapping"):
        range_join(pts, pts.withColumnRenamed("x", "lo").withColumnRenamed("pid", "hi"), "x", "lo", "hi")


def test_interval_join_parity_and_exactly_once(spark):
    from gene_etl_spark.operators.temporal import interval_join

    rng = np.random.default_rng(41)
    n_l, n_r = 120, 90
    llo = rng.integers(0, 8_000, n_l).astype("int64")
    lft = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_l),
            "llo": llo,
            "lhi": llo + rng.integers(-100, 3_000, n_l),  # some inverted
            "lid": np.arange(n_l),
        }
    )
    rlo = rng.integers(0, 8_000, n_r).astype("int64")
    rgt = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_r),
            "rlo": rlo,
            "rhi": rlo + rng.integers(-100, 3_000, n_r),
            "rid": np.arange(n_r),
        }
    )
    out = interval_join(
        spark.createDataFrame(lft),
        spark.createDataFrame(rgt),
        "llo", "lhi", "rlo", "rhi",
        by="k",
        grid=700,
    ).toPandas()
    con = duckdb.connect()
    con.register("l", lft)
    con.register("r", rgt)
    exp = con.sql(
        """
        select lid, rid from l join r
        on l.k = r.k and l.llo <= r.rhi and r.rlo <= l.lhi
        and l.llo <= l.lhi and r.rlo <= r.rhi
        """
    ).df()
    got = list(zip(out["lid"], out["rid"]))
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == set(zip(exp["lid"], exp["rid"]))


def test_sessionize_parity_with_duckdb(spark):
    from gene_etl_spark.operators.temporal import sessionize

    rng = np.random.default_rng(53)
    ev = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "t": rng.integers(0, 3_000, 300).astype("int64"),
            "eid": np.arange(300),
        }
    ).drop_duplicates(["k", "t"])
    gap = 40
    out = (
        sessionize(spark.createDataFrame(ev), on="t", by="k", gap=gap)
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", ev)
    exp = con.sql(
        f"""
        with x as (select k, t, eid, lag(t) over (partition by k order by t) pt from ev),
        y as (select k, t, eid, case when pt is null or t - pt > {gap} then t end sv from x)
        select k, t, eid, max(sv) over (
            partition by k order by t rows between unbounded preceding and current row
        ) as session_id from y order by k, t
        """
    ).df()
    assert out["session_id"].tolist() == exp["session_id"].astype("int64").tolist()
    # session starts are the stable ids: every session's id == its min t
    mins = out.groupby(["k", "session_id"])["t"].min()
    assert (mins.index.get_level_values("session_id") == mins.values).all()


def test_sessionize_null_times_and_validation(spark):
    from gene_etl_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, None), (1, 100)], "k long, t long"
    )
    rows = {r["t"]: r["session_id"] for r in sessionize(df, "t", "k", gap=30).collect()}
    assert rows[10] == 10 and rows[20] == 10 and rows[100] == 100
    assert rows[None] is None
    with pytest.raises(ValueError, match="gap"):
        sessionize(df, "t", "k", gap=0)
    with pytest.raises(ValueError, match="by"):
        sessionize(df, "t", [], gap=10)
