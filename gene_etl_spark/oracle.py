"""Independent reference materializer (tests only).

Computes the expected final lake state from the raw change log with
DuckDB — a completely separate engine from Spark — per FIXTURES.md §5:
for each (conv_id, turn_idx) take the payload of the max-(lsn, ts)
event; drop keys whose winning op is 'D'.

The equality contract is exactly the north rule's invariant: sort both
sides by (conv_id, turn_idx) and compare `text` per row, plus a stricter
full-row comparison as a secondary assert.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd


def materialize_expected(
    events_dir: str, up_to_lsn: int | None = None
) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no event tranches in {events_dir}")
    con = duckdb.connect()
    cols_probe = con.execute(
        "select * from read_parquet(?, union_by_name=true) limit 0", [files]
    ).df()
    has_tool = "tool" in cols_probe.columns
    tool_sel = "tool," if has_tool else "NULL::varchar as tool,"
    bound = f"where lsn <= {int(up_to_lsn)}" if up_to_lsn is not None else ""
    q = f"""
        with e as (
            select * from read_parquet(?, union_by_name=true) {bound}
        ),
        ranked as (
            select *, row_number() over (
                partition by conv_id, turn_idx
                order by lsn desc, ts desc
            ) as rn
            from e
        )
        select conv_id, turn_idx, role, text, {tool_sel} ts
        from ranked
        where rn = 1 and op <> 'D'
        order by conv_id, turn_idx
    """
    out = con.execute(q, [files]).df()
    con.close()
    return out


def assert_replay_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """North-rule equality: per-turn `text` under stable (conv_id,
    turn_idx) ordering; full-row equality as the stricter secondary."""
    a = actual.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = expected.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(a) == len(e), f"row count mismatch: actual={len(a)} expected={len(e)}"
    keys_a = list(zip(a["conv_id"], a["turn_idx"]))
    keys_e = list(zip(e["conv_id"], e["turn_idx"]))
    assert keys_a == keys_e, "key set/order mismatch"
    mism = (a["text"].fillna("\0") != e["text"].fillna("\0"))
    if mism.any():
        i = int(mism.idxmax())
        raise AssertionError(
            f"text mismatch at {keys_a[i]}: actual={a['text'][i]!r} expected={e['text'][i]!r} "
            f"({int(mism.sum())} rows differ)"
        )
    # secondary: full-row comparison on shared columns
    for col in ["role", "tool"]:
        if col in a.columns and col in e.columns:
            d = a[col].fillna("\0") != e[col].fillna("\0")
            assert not d.any(), f"secondary mismatch in {col}: {int(d.sum())} rows"
    if "ts" in a.columns and "ts" in e.columns:
        d = pd.to_datetime(a["ts"]) != pd.to_datetime(e["ts"])
        assert not d.any(), f"secondary mismatch in ts: {int(d.sum())} rows"
