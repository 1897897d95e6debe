"""Plan-inspection helpers: assert the physical plans the engine is designed
to produce (pushdown, pruning, broadcast, shuffle budget) instead of hoping
Catalyst picked them. Used by tests/test_plans.py and handy in notebooks:

    from manuscript_ocr_spark.plans import explain_str, scans, exchanges
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def scans(df: DataFrame) -> list[dict]:
    """Parquet scan nodes with their ReadSchema / PushedFilters."""
    text = explain_str(df)
    out = []
    for m in re.finditer(
        r"Scan parquet ?\n(?:.*\n)*?ReadSchema: (.*)", text
    ):
        block = text[m.start() : m.end()]
        loc = re.search(r"Location: \S+ \[(.*?)\]", block)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        out.append(
            {
                "location": loc.group(1) if loc else "",
                "read_schema": m.group(1).strip(),
                "pushed_filters": pushed.group(1) if pushed else "",
            }
        )
    return out


def count_nodes(df: DataFrame, node: str) -> int:
    return len(re.findall(rf"\b{node}\b", explain_str(df, "simple")))


def codegen_stages(df: DataFrame) -> int:
    """Whole-stage-codegen spans — shown as `*(n)` prefixes in simple mode."""
    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple"))))


def exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges)."""
    text = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?!SinglePartition)", text)) - 0


def broadcast_joins(df: DataFrame) -> int:
    return count_nodes(df, "BroadcastHashJoin")
