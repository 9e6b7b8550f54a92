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


def _count_unpartitioned_windows(text: str) -> int:
    """Count ``Window`` operators whose window spec has NO partition
    columns. In ``explain(formatted)`` each Window node's detail block
    carries ``Arguments: [exprs], [partition], [order]`` — BOTH lists
    are omitted when empty, so two-group Arguments are ambiguous: they
    are ``[exprs], [order]`` for an unpartitioned-ordered window (every
    entry carries ``ASC NULLS``/``DESC NULLS``) and ``[exprs],
    [partition]`` for a partitioned-but-unordered one (bare column
    refs — e.g. ``max(x) OVER (PARTITION BY k)``, which is NOT a
    single-task window and must not be flagged). One-group Arguments
    (whole-frame, no partition, no order) are unpartitioned. At runtime
    Spark warns "No Partition Defined ... moving all data to a single
    partition" for exactly the cases counted here."""
    n = 0
    for block in text.split("\n\n"):
        lines = block.strip().splitlines()
        if not lines or not re.match(r"\(\d+\) Window(\b|$)", lines[0].strip()):
            continue
        for line in lines[1:]:
            ls = line.strip()
            if not ls.startswith("Arguments: "):
                continue
            groups = ls.count("], [")
            if groups >= 2:
                break  # partition AND order lists present
            if groups == 0:
                n += 1  # frame-only spec: no partition at all
                break
            second = ls.rsplit("], [", 1)[1]
            if " ASC NULLS " in second or " DESC NULLS " in second:
                n += 1  # the sole list is an ORDER list → no partition
            break
    return n


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
    # scale-posture facts (round 8): a CASE chain whose branch count
    # grows with DATA cardinality is the expression-tree cousin of the
    # ams_f2 codegen blowup; an unpartitioned Window moves ALL rows to
    # one task. Both are fine at small fixtures and catastrophic at
    # 100 TB — make them assertable plan facts.
    max_case_branches: int = 0
    unpartitioned_windows: int = 0

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
            max_case_branches=max(
                (line.count(" WHEN ") for line in text.splitlines()), default=0
            ),
            unpartitioned_windows=_count_unpartitioned_windows(text),
        )

    def read_columns(self) -> set[str]:
        cols: set[str] = set()
        for s in self.read_schemas:
            cols.update(re.findall(r"(\w+):", s))
        return cols


# --------------------------------------------------- codegen health
#
# Whole-stage codegen can fail SILENTLY at runtime: if janino rejects a
# generated method (>64KB bytecode) or the compiled method exceeds
# ``spark.sql.codegen.hugeMethodLimit``, Spark logs a warning and falls
# back to interpreting the expression tree per row — the answer stays
# right while the query runs 10-100× slower (round 5's ams_f2: a ~100k-
# node tree ran interpreted for 138s where the compiled form takes ~3s,
# and every artifact stayed green). These helpers make that failure a
# static, assertable plan fact: compile every WholeStageCodegen subtree
# with janino (no execution) and expose the bytecode stats Spark itself
# checks before deciding to disable codegen.

HUGE_METHOD_LIMIT = 65535  # janino's per-method bytecode cap; also the
# default of spark.sql.codegen.hugeMethodLimit — beyond it Spark
# disables whole-stage codegen for the plan at runtime


@dataclass
class CodegenStats:
    subtree_head: str
    max_method_code_size: int
    max_const_pool_size: int

    @property
    def healthy(self) -> bool:
        """False when the generated code failed to compile (janino error
        → size -1 → runtime silently interprets) or its largest method
        exceeds the limit (runtime disables codegen for the plan)."""
        return 0 <= self.max_method_code_size <= HUGE_METHOD_LIMIT


def codegen_compile_stats(df: DataFrame) -> list[CodegenStats]:
    """janino-compile every WholeStageCodegen subtree of ``df``'s plan
    (via ``QueryExecution.debug.codegenToSeq`` — generation + compile
    only, nothing executes) and return the bytecode stats.

    The plan must be built with AQE OFF
    (``spark.sql.adaptive.enabled=false`` at DataFrame-construction
    time): with AQE on, ``CollapseCodegenStages`` runs per query stage
    during execution, the pre-execution plan holds no
    ``WholeStageCodegenExec`` nodes, and this returns ``[]`` — callers
    should treat an unexpectedly empty result as "not checked", not
    "healthy"."""
    seq = df._jdf.queryExecution().debug().codegenToSeq()
    out: list[CodegenStats] = []
    for i in range(seq.size()):
        t = seq.apply(i)
        stats = t._3()
        head = t._1().strip().splitlines()[0][:160]
        out.append(
            CodegenStats(
                subtree_head=head,
                max_method_code_size=stats.maxMethodCodeSize(),
                max_const_pool_size=stats.maxConstPoolSize(),
            )
        )
    return out


def codegen_offenders(df: DataFrame) -> list[CodegenStats]:
    """The subtrees whose whole-stage codegen would be disabled at
    runtime. Empty list = every codegen stage compiles under the limit."""
    return [s for s in codegen_compile_stats(df) if not s.healthy]
