"""Physical-plan auditing: assert the plans we want, not just the
results. Used by tests and ``tools/explain_audit.py`` to check that

* filters reach the parquet scan (``PushedFilters`` non-empty),
* projections prune the read schema (``ReadSchema`` ⊂ full schema),
* dimension joins broadcast (``BroadcastHashJoin``),
* top-k compiles to ``TakeOrderedAndProject`` (per-partition heaps, no
  global sort),
* hot expressions stay inside ``WholeStageCodegen`` spans.

A correct-but-unpushed plan is a 100 TB regression waiting to happen —
these checks make plan shape part of the test surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanFacts:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_broadcast_join: bool = False
    has_sort_merge_join: bool = False
    has_bnl_join: bool = False
    has_take_ordered: bool = False
    codegen_stages: int = 0
    exchanges: int = 0

    @classmethod
    def of(cls, df: DataFrame) -> "PlanFacts":
        text = formatted_plan(df)
        pushed = [
            m.group(1).strip()
            for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text)
            if m.group(1).strip()
        ]
        part = [
            m.group(1).strip()
            for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text)
            if m.group(1).strip()
        ]
        schemas = [m.group(1).strip() for m in re.finditer(r"ReadSchema: (.+)", text)]
        return cls(
            text=text,
            pushed_filters=pushed,
            partition_filters=part,
            read_schemas=schemas,
            has_broadcast_join="BroadcastHashJoin" in text,
            has_sort_merge_join="SortMergeJoin" in text,
            has_bnl_join="BroadcastNestedLoopJoin" in text,
            has_take_ordered="TakeOrderedAndProject" in text,
            # simple mode prints "WholeStageCodegen (N)"; formatted mode
            # annotates operators with "[codegen id : N]" — count both
            codegen_stages=len(
                set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
                | set(re.findall(r"\[codegen id : (\d+)\]", text))
            ),
            exchanges=text.count("Exchange"),
        )

    def read_columns(self) -> set[str]:
        cols: set[str] = set()
        for s in self.read_schemas:
            cols.update(re.findall(r"(\w+):", s))
        return cols
