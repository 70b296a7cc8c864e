"""Deterministic binlog/WAL simulator.

Generates the change-event stream described in FIXTURES.md §2 (replacing
the reference's static SQL seed fixtures, reference: seeds/01_dim.sql,
seeds/02_expression.sql, tests/conftest.py:112-142 — seeded synthetic
data is the reference's own fixture strategy).

Properties (all seeded, fully deterministic):
- inserts for every (conv_id, turn_idx), then a stream of updates,
  deletes, and re-inserts;
- hot-key skew: conversation 0 carries ~``skew_share`` of all events;
- out-of-order arrival: ~``disorder_pct`` of events have event-time
  disorder relative to LSN order;
- additive schema evolution: tranche files before ``evolve_at_frac`` of
  the stream physically lack the ``tool`` column.

Generation is vectorized NumPy → Arrow → Parquet tranche files (this is
test/bench fixture generation, not the engine data path). Text payloads
encode (conv, turn, lsn) so the per-turn text-equality invariant is a
real check, not a vacuous one.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "none"])


def generate_change_stream(
    out_dir: str,
    *,
    n_convs: int = 100,
    max_turns: int = 40,
    n_events: int = 20_000,
    seed: int = 42,
    skew_share: float = 0.30,
    update_frac: float = 0.45,
    delete_frac: float = 0.06,
    disorder_pct: float = 0.10,
    evolve_at_frac: float = 0.4,
    n_tranches: int = 8,
    base_ts: int = 1_700_000_000,
) -> dict:
    """Write tranche parquet files of change events; return stream facts."""
    rng = np.random.default_rng(seed)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    turns_per_conv = rng.integers(3, max_turns + 1, size=n_convs)

    # --- base inserts: one I per (conv, turn) -----------------------------
    conv_base = np.repeat(np.arange(n_convs), turns_per_conv)
    turn_base = np.concatenate([np.arange(t) for t in turns_per_conv])
    n_base = conv_base.size

    # --- follow-on events: skewed key choice ------------------------------
    n_follow = max(0, n_events - n_base)
    hot_mask = rng.random(n_follow) < skew_share
    conv_follow = np.where(
        hot_mask, 0, rng.integers(0, n_convs, size=n_follow)
    )
    turn_follow = (
        rng.random(n_follow) * turns_per_conv[conv_follow]
    ).astype(np.int64)

    conv = np.concatenate([conv_base, conv_follow])
    turn = np.concatenate([turn_base, turn_follow]).astype(np.int32)
    n = conv.size

    # ops: base = I; follow-on = U or D (re-insert after D is just a later
    # U/I — LWW handles either; we emit U for simplicity of op accounting,
    # plus explicit re-insert I's for a sample of deleted keys)
    op = np.full(n, "U", dtype=object)
    op[:n_base] = "I"
    del_mask = np.zeros(n, dtype=bool)
    if n_follow:
        dm = rng.random(n_follow) < (delete_frac / max(update_frac + delete_frac, 1e-9))
        del_mask[n_base:] = dm
        op[n_base:][dm] = "D"

    lsn = np.arange(1, n + 1, dtype=np.int64)

    # event ts: mostly monotone with lsn, with deliberate disorder
    ts = base_ts + lsn * 3 + rng.integers(0, 3, size=n)
    disorder = rng.random(n) < disorder_pct
    ts[disorder] -= rng.integers(60, 600, size=int(disorder.sum()))
    event_ts = base_ts + lsn * 3 + rng.integers(0, 2, size=n)

    role = ROLES[rng.integers(0, len(ROLES), size=n)]
    tool = np.where(role == "tool", TOOLS[rng.integers(0, len(TOOLS), size=n)], None)

    conv_ids = np.char.add("conv_", np.char.zfill(conv.astype("U8"), 6))
    pad = np.char.multiply("x", rng.integers(0, 64, size=n))
    text = np.char.add(
        np.char.add(
            np.char.add(
                np.char.add(
                    np.char.add(np.char.add("text c", conv.astype("U8")), " t"),
                    turn.astype("U8"),
                ),
                " lsn",
            ),
            np.char.add(np.char.add(lsn.astype("U12"), " "), pad),
        ),
        "",
    ).astype(object)
    # deletes carry no payload
    dmask = op == "D"
    role = np.where(dmask, None, role)
    text_arr = text.copy()
    text_arr[dmask] = None
    tool = np.where(dmask, None, tool)

    table = pa.table(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "op": pa.array(op, pa.string()),
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text_arr, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array((ts * 1_000_000).astype("int64"), pa.timestamp("us")),
            "event_ts": pa.array((event_ts * 1_000_000).astype("int64"), pa.timestamp("us")),
        }
    )

    # --- tranche split with schema evolution ------------------------------
    bounds = np.linspace(0, n, n_tranches + 1).astype(int)
    evolve_row = int(n * evolve_at_frac)
    for i in range(n_tranches):
        lo, hi = bounds[i], bounds[i + 1]
        if lo >= hi:
            continue
        chunk = table.slice(lo, hi - lo)
        if hi <= evolve_row:  # pre-evolution tranche: no `tool` column
            chunk = chunk.drop_columns(["tool"])
        pq.write_table(chunk, os.path.join(out_dir, f"tranche-{i:04d}.parquet"))

    return {
        "n_events": int(n),
        "n_base_inserts": int(n_base),
        "max_lsn": int(n),
        "n_convs": int(n_convs),
        "evolve_row": evolve_row,
        "out_dir": out_dir,
    }
