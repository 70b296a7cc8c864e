"""Binlog/WAL tail source: LSN-bounded slice reads + batch planning.

The change log is a directory of Parquet tranche files totally ordered
by ``lsn`` (SURVEY.md §2.1 S9). A batch is the half-open LSN range
``(start_lsn, end_lsn]``; the predicate is pushed into the Parquet scan
(row-group min/max pruning), so reading slice k does not scan the whole
log — the property that lets the same code tail a 10^10-event stream.

Schema evolution on read: tranches written before a column existed are
aligned by reading each distinct physical schema group with the full
declared schema (missing Parquet columns surface as nulls) — the
``unionByName(allowMissingColumns=True)`` semantics without losing
filter pushdown.

Reference analogue: the extraction layer (etl/io.py:104-164) reads
keyed slices of the fact table; the planner generalizes its
batch_size/checkpoint_interval knobs (etl/config.py:88-92).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class BinlogSource:
    """fmt="parquet" (default): columnar tranches, footer-schema grouped,
    LSN predicates prune row groups. fmt="jsonl": newline-delimited JSON
    tranches (Kafka/Debezium-style feeds) — JSON carries no types, so an
    explicit declared schema is required; slice predicates still reach
    the scan but prune post-parse (parquet remains the scale format)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType | None = None,
        fmt: str = "parquet",
    ):
        if fmt not in ("parquet", "jsonl"):
            raise ValueError("fmt must be 'parquet' or 'jsonl'")
        if fmt == "jsonl" and schema is None:
            raise ValueError("jsonl binlogs require an explicit schema")
        self.spark = spark
        self.path = path
        self.fmt = fmt
        self._schema = schema
        self._user_schema = schema is not None
        # footer schemas cached per file path (tranche files are
        # immutable); the file LISTING is never cached — a long-lived
        # runner tailing a growing log must see tranches that appear
        # after its first read, so _groups() re-lists on every call.
        self._footer_cache: dict[str, tuple[str, ...]] = {}
        self._lsn_bounds_cache: dict[str, tuple[int, int] | None] = {}
        self._last_fileset: tuple[str, ...] = ()

    # ------------------------------------------------------------------ #
    def files(self) -> list[str]:
        ext = "*.parquet" if self.fmt == "parquet" else "*.jsonl"
        return sorted(glob.glob(os.path.join(self.path, ext)))

    def _read(self, schema: T.StructType, fs: list[str]):
        reader = self.spark.read.schema(schema)
        return reader.parquet(*fs) if self.fmt == "parquet" else reader.json(list(fs))

    def _file_columns(self, f: str) -> tuple[str, ...]:
        """Physical column set of one tranche (footer-only for parquet;
        first line's keys for jsonl — tranche files are schema-uniform
        by the writer contract)."""
        if self.fmt == "parquet":
            return tuple(pq.ParquetFile(f).schema_arrow.names)
        import json as _json

        with open(f) as fh:
            line = fh.readline()
        return tuple(_json.loads(line).keys()) if line.strip() else ()

    @property
    def schema(self) -> T.StructType:
        if self._schema is None:
            self._groups()  # refresh + derive
            if self._schema is None:  # empty log directory
                return T.StructType([])
        return self._schema

    def _groups(self) -> list[tuple[tuple[str, ...], list[str]]]:
        """Group tranche files by physical column set. Re-lists the
        directory every call (new tranches appear between batches);
        footer reads hit the per-path cache, so the steady-state cost is
        one directory listing."""
        groups: dict[tuple[str, ...], list[str]] = {}
        for f in self.files():
            cols = self._footer_cache.get(f)
            if cols is None:
                cols = self._file_columns(f)
                self._footer_cache[f] = cols
            groups.setdefault(cols, []).append(f)
        fileset = tuple(sorted(self._footer_cache))
        if fileset != self._last_fileset:
            self._last_fileset = fileset
            if not self._user_schema:
                # re-derive the declared union schema: a new tranche may
                # carry evolved columns (first-seen field order kept)
                fields: dict[str, T.StructField] = {}
                for _cols, fs in groups.items():
                    df = self.spark.read.parquet(fs[0])
                    for fld in df.schema.fields:
                        fields.setdefault(fld.name, fld)
                self._schema = T.StructType(list(fields.values()))
        return list(groups.items())

    # ------------------------------------------------------------------ #
    def read_slice(self, start_lsn: int, end_lsn: int) -> DataFrame:
        """Events with start_lsn < lsn <= end_lsn, full declared schema.

        Tranche files whose cached footer LSN bounds prove they cannot
        overlap the slice are dropped BEFORE the scan is planned (file-
        level pruning on top of the row-group pruning the lsn predicate
        already gets) — at a 10^6-tranche log a slice read schedules
        tasks only for its own handful of tranches; files with unknown
        bounds are kept."""
        schema = self.schema
        out: DataFrame | None = None
        for _cols, fs in self._groups():
            kept = []
            for f in fs:
                b = self.file_lsn_bounds(f)
                if b is not None and (b[1] <= start_lsn or b[0] > end_lsn):
                    continue
                kept.append(f)
            if not kept:
                continue
            part = self._read(schema, kept)
            out = part if out is None else out.unionByName(part)
        if out is None:
            return self.spark.createDataFrame([], schema)
        return out.where(
            (F.col("lsn") > F.lit(start_lsn)) & (F.col("lsn") <= F.lit(end_lsn))
        )

    def file_lsn_bounds(self, f: str) -> tuple[int, int] | None:
        """[min_lsn, max_lsn] of one tranche from parquet footer stats
        (driver-side, cached — tranches are immutable). None when the
        format or footer can't say (jsonl, missing stats)."""
        if f in self._lsn_bounds_cache:
            return self._lsn_bounds_cache[f]
        bounds: tuple[int, int] | None = None
        if self.fmt == "parquet":
            try:
                md = pq.ParquetFile(f).metadata
                idx = md.schema.to_arrow_schema().get_field_index("lsn")
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    bounds = (int(lo), int(hi))
            except Exception:
                bounds = None
        self._lsn_bounds_cache[f] = bounds
        return bounds

    def snapshot(self, start_lsn: int | None = None, end_lsn: int | None = None) -> dict:
        """SourceSnapshot lineage record (reference models.py:166-180
        analogue): the identity of what a batch read — the contributing
        tranche files (pruned by footer LSN bounds to those overlapping
        the ``(start_lsn, end_lsn]`` slice, so a 10^6-tranche log never
        lists wholesale into a ledger row), row-count-bearing file count,
        declared-schema hash, and format. Stored per batch in the
        ledger's ``source_snapshot`` field; ``events_read`` on the same
        ledger row is the row-count reconciliation partner."""
        import hashlib

        sel = []
        for f in self.files():
            if start_lsn is not None and end_lsn is not None:
                b = self.file_lsn_bounds(f)
                # (start, end] overlap test; unknown bounds => keep (may contribute)
                if b is not None and (b[1] <= start_lsn or b[0] > end_lsn):
                    continue
            sel.append(os.path.basename(f))
        return {
            "source_path": os.path.abspath(self.path),
            "source_format": self.fmt,
            "n_files": len(sel),
            "files": sel,
            "schema_hash": hashlib.md5(
                self.schema.json().encode("utf-8")
            ).hexdigest(),
        }

    def max_lsn(self) -> int:
        """High-water LSN of the log. Fast path: every tranche's footer
        carries exact lsn min/max stats (``file_lsn_bounds``), so the
        answer is a driver-side max over cached bounds — no Spark job,
        no scan. Falls back to one aggregate scan of just the files
        whose bounds are unknown (jsonl, stats-less writers)."""
        unknown: list[str] = []
        best: int | None = None
        for f in self.files():
            b = self.file_lsn_bounds(f)
            if b is None:
                unknown.append(f)
            else:
                best = b[1] if best is None else max(best, b[1])
        if unknown:
            schema = self.schema
            r = self._read(schema, unknown).agg(F.max("lsn").alias("m")).collect()[0]["m"]
            if r is not None:
                best = int(r) if best is None else max(best, int(r))
        return int(best or 0)

    def plan_batches(
        self, from_lsn: int, slice_width: int, max_batches: int | None = None
    ) -> list[tuple[int, int]]:
        """Deterministic LSN-bounded slices (start exclusive, end inclusive).

        Replayable: the same (from_lsn, width, log) always yields the same
        plan, which is what makes resume + fencing sound.
        """
        hi = self.max_lsn()
        out: list[tuple[int, int]] = []
        lo = from_lsn
        while lo < hi:
            end = min(lo + slice_width, hi)
            out.append((lo, end))
            lo = end
            if max_batches is not None and len(out) >= max_batches:
                break
        return out
