"""Physical-plan inspection helpers.

Used by tests and tuning sessions to assert the plans we designed for
are the plans we got: filters pushed into the Parquet scan, broadcast
joins for small dims, whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan carries PushedFilters (predicate reached Parquet)."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def _op_count(df: DataFrame, op: str) -> int:
    """Count operators in the formatted plan's numbered detail section
    (the tree view repeats names, so plain substring counts double)."""
    import re

    return len(re.findall(rf"\(\d+\)\s+{op}\b", formatted_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    return _op_count(df, "BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale-limiting op."""
    return _op_count(df, "Exchange")


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning evidence)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            for part in inner.split(","):
                name = part.split(":")[0].strip()
                if name:
                    out.append(name)
    return out
