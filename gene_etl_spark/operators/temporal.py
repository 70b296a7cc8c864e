"""Temporal joins Spark lacks as built-ins, composed from shuffle-lean
DataFrame primitives.

``asof_join`` — for every left row, the single right row with the
greatest (backward) / least (forward) time not past the left row's
time, per key. The naive formulation is an inequality join, which Spark
can only execute as a broadcast-nested-loop or a cartesian-with-filter —
O(|L|·|R|) work that falls over at scale. This implementation is the
union-and-window form instead: tag the two sides, union them, and run
one window per key ordered by (time, side) taking the last
non-null right payload — a SINGLE hash shuffle on the key plus a
per-partition sort, the same cost envelope as a groupBy. 100 TB shape:
cost ∝ |L|+|R| shuffled once, no pair blow-up, AQE-skew-splittable.

``range_join`` — point-in-interval equi-expansion: intervals are
exploded onto a fixed grid of coarse buckets (interval span / grid
step bounded by construction), points map to one bucket, and the join
becomes an equi-join on (key, grid_cell) followed by the exact bounds
filter — the standard trick for making Catalyst hash-partition an
interval predicate instead of nested-looping it (DuckDB's IEJoin and
Spark's range-join hints solve the same problem engine-side).

The DuckDB twin of ``asof_join`` is ``ASOF JOIN`` (parity pinned in
tests/test_temporal_join.py); ``range_join``'s twin is a plain
inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["asof_join", "interval_join", "range_join", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row, decorated with the payload
    of the temporally closest ``right`` row per ``by`` group.

    direction='backward' (default): the right row with the greatest
    ``on`` value <= the left row's (DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof`` semantics). 'forward': the least value >=.
    Unmatched left rows keep null right columns (left-join shape).

    ``tolerance`` (same units as ``on``): matches farther than this
    from the left row are nulled out.

    Ties: right rows sharing the exact match time resolve to the one
    the per-key (time, original-order-free) sort places last — callers
    needing a deterministic winner among equal-time right rows should
    pre-dedup (e.g. lww_dedup_agg), same contract as the merge path.

    NULL handling: right rows with a null ``on`` value can never match
    and are dropped; left rows with a null ``on`` value come back
    unmatched. A matched right row's payload is carried ATOMICALLY
    (one struct per right row), so a right row whose payload value is
    legitimately NULL yields that NULL — never an older row's value.

    Right payload columns that collide with left column names are
    renamed with ``suffix``.

    With ``by=None`` the window runs in a single partition (one task
    sorts |L|+|R| rows) — fine for dimension-sized inputs, wrong for
    large ones; at scale always pass the entity key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if on in by:
        raise ValueError("'on' column cannot also be a 'by' key")
    for c in [on, *by]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")

    payload = [c for c in right.columns if c not in (on, *by)]
    if not payload:
        raise ValueError("right side carries no payload columns")
    out_names = {c: c + suffix if c in left.columns else c for c in payload}
    matched_on = "__asof_t" + suffix

    import pyspark.sql.types as T

    # the matched right row travels as ONE struct (time + payload): a
    # left row's structural null and a right row's legitimately-NULL
    # payload field are then distinct — last(ignorenulls) lands on the
    # nearest right ROW, whatever its field values.
    match_type = T.StructType(
        [T.StructField("__t", right.schema[on].dataType)]
        + [T.StructField(out_names[c], right.schema[c].dataType) for c in payload]
    )

    # ---- tag + union ---------------------------------------------------
    # side 0 sorts before side 1 at equal time; backward wants right rows
    # FIRST at a tie (<= is inclusive), forward wants them LAST in the
    # reversed sort (>= inclusive) — right is side 0 in both layouts.
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(match_type).alias("__asof_match"),
    )
    r_tag = right.where(F.col(on).isNotNull()).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, *by)],
        *[F.col(c) for c in (on, *by)],
        F.lit(0).alias("__asof_side"),
        F.struct(
            F.col(on).alias("__t"),
            *[F.col(c).alias(out_names[c]) for c in payload],
        ).alias("__asof_match"),
    )
    unioned = l_tag.unionByName(r_tag)

    from pyspark.sql import Window

    order = [F.col(on).asc(), F.col("__asof_side").asc()]
    if direction == "forward":
        order = [F.col(on).desc_nulls_first(), F.col("__asof_side").asc()]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__asof_side").alias("__asof_side"),
        F.last("__asof_match", ignorenulls=True).over(w).alias("__asof_match"),
    )
    m = F.col("__asof_match")
    keep = F.col(on).isNotNull() & m.isNotNull()
    if tolerance is not None:
        delta = (
            F.col(on) - m["__t"] if direction == "backward" else m["__t"] - F.col(on)
        )
        keep = keep & (delta <= F.lit(tolerance))
    return (
        filled.where(F.col("__asof_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.when(keep, m[out_names[c]]).alias(out_names[c]) for c in payload],
            F.when(keep, m["__t"]).alias(matched_on),
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | str | None = None,
    grid: int = 1000,
) -> DataFrame:
    """Inner join of ``points`` rows to every ``intervals`` row whose
    [lo, hi] contains the point (plus equal ``by`` keys).

    Equi-expansion: each interval explodes onto ``ceil(span/grid)+1``
    coarse grid cells, each point maps to exactly one, and the join is
    a hash equi-join on (by…, cell) with the exact containment filter
    on top — Catalyst never sees an inequality-only join, so the plan
    is shuffle-hash/sort-merge, not nested-loop. Pick ``grid`` near the
    TYPICAL interval span: explosion factor stays O(1) and each cell's
    candidate set stays local. Intervals with lo > hi match nothing.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    overlap = set(points.columns) & set(intervals.columns) - set(by)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    if grid <= 0:
        raise ValueError("grid must be positive")

    cell = F.floor(F.col(point_col) / grid)
    p = points.withColumn("__cell", cell.cast("long"))
    lo_cell = F.floor(F.col(lo_col) / grid).cast("long")
    hi_cell = F.floor(F.col(hi_col) / grid).cast("long")
    i = (
        intervals.where(F.col(lo_col) <= F.col(hi_col))
        .withColumn("__cell", F.explode(F.sequence(lo_cell, hi_cell)))
    )
    joined = p.join(i, [*by, "__cell"], "inner").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("__cell")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    by: list[str] | str | None = None,
    grid: int = 1000,
) -> DataFrame:
    """Inner join of every ``left`` interval to every ``right`` interval
    it overlaps ([lo, hi] closed on both ends, plus equal ``by`` keys).

    Same grid equi-expansion as ``range_join``, on BOTH sides — and the
    same exactly-once trick the LSH band join uses: two overlapping
    intervals share every cell of their intersection, so the pair is
    emitted only at the FIRST shared cell, ``floor(max(lo_l, lo_r) /
    grid)``. Output carries no duplicates without any ``distinct()``
    (no extra shuffle). Inverted intervals (lo > hi) match nothing.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    overlap = set(left.columns) & set(right.columns) - set(by)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    if grid <= 0:
        raise ValueError("grid must be positive")

    def explode_cells(df, lo, hi):
        lo_cell = F.floor(F.col(lo) / grid).cast("long")
        hi_cell = F.floor(F.col(hi) / grid).cast("long")
        return df.where(F.col(lo) <= F.col(hi)).withColumn(
            "__cell", F.explode(F.sequence(lo_cell, hi_cell))
        )

    l = explode_cells(left, left_lo, left_hi)
    r = explode_cells(right, right_lo, right_hi)
    first_shared = F.floor(
        F.greatest(F.col(left_lo), F.col(right_lo)) / grid
    ).cast("long")
    joined = l.join(r, [*by, "__cell"], "inner").where(
        (F.col(left_lo) <= F.col(right_hi))
        & (F.col(right_lo) <= F.col(left_hi))
        & (F.col("__cell") == first_shared)
    )
    return joined.drop("__cell")


def sessionize(
    df: DataFrame,
    on: str,
    by: list[str] | str,
    gap: int | float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: rows within ``by`` whose ``on`` values
    are more than ``gap`` apart start a new session. Adds ``session_col``
    = the session's FIRST ``on`` value (stable across reprocessing —
    never an ordinal that shifts when earlier data arrives late).

    One window per key (lag → new-session flag → running max of session
    starts): a single hash shuffle on ``by`` plus a per-partition sort,
    the batch twin of the streaming session windows in
    streaming/windowed.py. Rows with a null ``on`` get a null session.
    """
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ValueError("sessionize requires at least one 'by' key")
    if gap <= 0:
        raise ValueError("gap must be positive")

    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(F.col(on).asc())
    prev = F.lag(F.col(on)).over(w)
    is_start = prev.isNull() | ((F.col(on) - prev) > F.lit(gap))
    start_val = F.when(is_start, F.col(on))
    running = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(on).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.where(F.col(on).isNotNull()).withColumn(
        session_col, F.max(start_val).over(running)
    )
    nulls = df.where(F.col(on).isNull()).withColumn(
        session_col, F.lit(None).cast(df.schema[on].dataType)
    )
    return out.unionByName(nulls)
