#!/usr/bin/env python
"""Append a parsed bench result to the BENCH_HISTORY table in
BASELINE.md, so round-over-round drift (host or code) is
machine-attributable without manual A/B archaeology.

Reads either a BENCH_r{N}.json driver artifact (uses its `tail` /
`parsed` fields) or the BENCH_DETAIL.json that bench.py writes, plus
the current commit, and appends one markdown row:

| label | commit | sf | n_queries | cold (s) | warm (s) |

Usage:
    python bench.py && python tools/record_bench.py --label r5-closing
    python tools/record_bench.py --from BENCH_r04.json --label r4-driver
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
MARKER = "## BENCH_HISTORY"
HEADER = (
    "| label | commit | sf | n_queries | cold (s) | warm (s) |\n"
    "| --- | --- | --- | --- | --- | --- |\n"
)

# Drift canary (round-9): nine TPC-H-shaped queries untouched since
# round 3, summed per run and divided by the r3 driver reference total
# to estimate HOST drift — round-over-round totals were polluted by
# 25-45% machine drift on untouched queries every round (documented
# r4, r7→r8), and the normalized column stops the manual re-litigation.
CANARY = [
    "join_q3",
    "groupby_q1",
    "where_theta",
    "join_q5",
    "window_topk",
    "rollup",
    "exists_q4",
    "outerjoin_q13",
    "having_q18",
]
# Σ canary cold seconds in the r3 driver artifact (BENCH_r03.json)
CANARY_REF = 6.587
MARKER2 = "## BENCH_HISTORY (drift-normalized)"
HEADER2 = (
    "| label | commit | sf | n_queries | cold (s) | warm (s) "
    "| canary (s) | drift | norm cold (s) |\n"
    "| --- | --- | --- | --- | --- | --- | --- | --- | --- |\n"
)

# Heavy-axis canary (round-11, VERDICT r10 task 2): the small-query
# TPC-H canary tracks scheduler/JIT pressure but NOT sustained-CPU
# throughput, and the two axes move independently on this host (the
# r10 close runs normalized to 441 vs 573 s on identical code). Two
# pinned iterative queries — pagerank (exact-int recurrence, code
# frozen r9) and dawid_skene (wide-posterior EM, frozen r9) — probe the
# sustained axis directly. Steady-state (min-of-passes) is the unit:
# cold numbers of iterative queries carry first-run JIT.
HEAVY_CANARY = ["pagerank", "dawid_skene"]
# Σ best-of-3 isolated quiet-host seconds, measured r11 (2026-08-16):
# pagerank 10.00, dawid_skene 12.53
HEAVY_REF = 22.53
MARKER3 = "## BENCH_HISTORY (heavy axis)"
HEADER3 = (
    "| label | commit | pagerank min (s) | dawid_skene min (s) "
    "| heavy Σ (s) | heavy drift |\n"
    "| --- | --- | --- | --- | --- | --- |\n"
)


def _parse_source(path: Path) -> dict:
    raw = json.loads(path.read_text())
    # driver artifact: {"tail": "...", "parsed": {...}|null}
    if "tail" in raw:
        if raw.get("parsed"):
            return raw["parsed"]
        # reconstruct from the tail: the last stdout line that parses
        # as a JSON object with the bench metric (line-based json.loads
        # — a brace regex can't handle nested objects like `errors`)
        for line in reversed(raw["tail"].splitlines()):
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "metric" in obj:
                return obj
        raise SystemExit(f"{path}: neither parsed nor a parseable tail line")
    return raw


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="src", default=str(ROOT / "BENCH_DETAIL.json"))
    ap.add_argument("--label", required=True)
    ap.add_argument(
        "--commit",
        default=None,
        help="commit to attribute (default: current HEAD). Use for "
        "backfilling historical driver artifacts, where HEAD would lie.",
    )
    args = ap.parse_args()

    d = _parse_source(Path(args.src))
    commit = args.commit or subprocess.run(
        ["git", "-C", str(ROOT), "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    n_q = d.get("n_queries") or len(d.get("queries", {}))
    row = (
        f"| {args.label} | {commit} | {d.get('sf')} | {n_q} "
        f"| {d.get('value')} | {d.get('value_warm', '')} |\n"
    )

    # drift-normalized row (needs per-query detail for the canary).
    # Guarded (round-9 advice): a value-less artifact or a zero canary
    # total must skip the row, not crash with TypeError/ZeroDivision.
    qs = d.get("queries") or {}
    row2 = None
    val = d.get("value")
    if all(c in qs for c in CANARY) and val:
        canary_total = sum(qs[c] for c in CANARY)
        if canary_total > 0:
            drift = canary_total / CANARY_REF
            norm = val / drift
            row2 = (
                f"| {args.label} | {commit} | {d.get('sf')} | {n_q} "
                f"| {val} | {d.get('value_warm', '')} "
                f"| {canary_total:.3f} | {drift:.2f}x | {norm:.1f} |\n"
            )

    # heavy-axis row: steady-state (min) of the two pinned iterative
    # queries; fall back to warm then cold for pre-r10 artifacts that
    # lack the min pass
    heavy = d.get("queries_min") or d.get("queries_warm") or qs
    row3 = None
    if all(c in heavy for c in HEAVY_CANARY):
        h = [heavy[c] for c in HEAVY_CANARY]
        hsum = sum(h)
        if hsum > 0:
            row3 = (
                f"| {args.label} | {commit} | {h[0]} | {h[1]} "
                f"| {hsum:.2f} | {hsum / HEAVY_REF:.2f}x |\n"
            )

    # Archive the per-query detail under the round label so round-over-
    # round per-query comparison never depends on the driver tail's
    # last-75-query truncation (r7 could compare only 29/114 r6
    # queries). BENCH_DETAIL.json itself is overwritten by every
    # bench.py run; the labeled copy is the durable record.
    src_path = Path(args.src)
    if src_path.name == "BENCH_DETAIL.json" and src_path.exists():
        archive = ROOT / f"BENCH_DETAIL_{args.label}.json"
        archive.write_text(src_path.read_text())
        print(f"archived {archive.name}", file=sys.stderr)

    baseline = ROOT / "BASELINE.md"
    text = baseline.read_text()
    if MARKER not in text:
        text += (
            f"\n{MARKER}\n\nPer-round parsed bench totals (appended by "
            "tools/record_bench.py; cold is the headline metric, warm the "
            "steady-state pass):\n\n" + HEADER
        )
    if not text.endswith("\n"):
        text += "\n"
    if MARKER2 in text:
        # v1 table sits ABOVE the v2 table: insert the v1 row at the
        # end of its own section, not at the file end
        head, tail = text.split(MARKER2, 1)
        text = head + row + MARKER2 + tail
    else:
        text += row
    if row2:
        if MARKER2 not in text:
            text += (
                f"\n{MARKER2}\n\nSame totals with the host-drift estimate "
                "factored out: `canary` = Σ cold seconds over the 9 "
                "never-touched TPC-H canary queries "
                f"({', '.join(CANARY)}), `drift` = canary ÷ "
                f"{CANARY_REF} (the r3 driver reference), `norm cold` = "
                "cold ÷ drift. Compare norm-cold across rounds; raw "
                "cold stays the official driver metric:\n\n" + HEADER2
            )
        if MARKER3 in text:
            head, tail = text.split(MARKER3, 1)
            text = head + row2 + MARKER3 + tail
        else:
            text += row2
    else:
        print(
            "no drift-normalized row: detail lacks canary queries",
            file=sys.stderr,
        )
    if row3:
        if MARKER3 not in text:
            text += (
                f"\n{MARKER3}\n\nSustained-CPU drift probe (the small-query "
                "canary above tracks scheduler/JIT pressure; iterative "
                "queries drift on an independent axis — the r10 close-run "
                "finding): steady-state (min-of-passes) seconds of the two "
                f"pinned iterative queries ({', '.join(HEAVY_CANARY)}, both "
                "code-frozen since r9), `heavy drift` = Σ ÷ "
                f"{HEAVY_REF} (Σ best-of-3 isolated quiet-host, r11):\n\n"
                + HEADER3
            )
        text += row3
    else:
        print(
            "no heavy-axis row: detail lacks the pinned heavy queries",
            file=sys.stderr,
        )
    baseline.write_text(text)
    print(f"appended to BASELINE.md: {row}", end="", file=sys.stderr)


if __name__ == "__main__":
    main()
