#!/usr/bin/env python
"""Sharded fast-tier runner (round-12 verdict task 5).

The serial fast tier crossed 33 minutes at 760 tests: per-test Spark
actions cost ~2.5 s each, so moving a handful of slow tests can never
buy the 2x the target (≤15 min) needs — parallelism can. pytest-xdist
is not installable in this environment, so this script shards the
fast-tier TEST FILES across N concurrent pytest processes (each its
own JVM; 32 cores host two `local[*]` sessions comfortably — the
suite is action-latency-bound, not CPU-bound).

Sharding is DETERMINISTIC: files sorted by (known-weight desc, name)
and dealt round-robin, so both shards are balanced and stable across
runs. Each shard writes /tmp/fast_tier_shard{i}.log; the combined
exit code is non-zero if any shard fails.

Usage: python tools/fast_tier.py [n_shards=2]
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# measured module costs from the r12 serial run (seconds in the
# --durations top-50; unlisted modules default to 10) — only used to
# balance shards, correctness does not depend on accuracy
WEIGHTS = {
    "test_dedup_similarity.py": 95,
    "test_annotation.py": 70,
    "test_streaming.py": 35,
    "test_ann_poly.py": 100,
    "test_session_edges.py": 55,
    "test_evaluation.py": 25,
    "test_graph_curation.py": 30,
    "test_unigram.py": 16,
    "test_pq.py": 15,
    "test_plans.py": 45,
    "test_sessionize.py": 30,
    "test_semdedup.py": 25,
    "test_stats_wave10b.py": 25,
    "test_wave11b.py": 22,
    "test_tables.py": 22,
    "test_funnel.py": 20,
    "test_wave12.py": 130,
    "test_engine.py": 20,
    "test_guards_audit.py": 25,
    "test_guards_wave11.py": 40,
    "test_stats_wave10.py": 35,
    "test_stats_wave10c.py": 30,
    "test_http_socket.py": 20,
    "test_retrieval.py": 25,
    "test_graph_ts_wave10.py": 35,
    "test_quantiles.py": 20,
    "test_wave11c.py": 25,
    "test_wave11d.py": 25,
    "test_eval_wave10.py": 20,
}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    files = sorted(
        (p for p in (REPO / "tests").glob("test_*.py")),
        key=lambda p: (-WEIGHTS.get(p.name, 10), p.name),
    )
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0] * n
    for p in files:
        i = loads.index(min(loads))  # greedy least-loaded
        shards[i].append(str(p))
        loads[i] += WEIGHTS.get(p.name, 10)
    procs = []
    t0 = time.time()
    import os

    for i, shard in enumerate(shards):
        log = open(f"/tmp/fast_tier_shard{i}.log", "w")
        env = dict(os.environ)
        # split the cores between shards — two local[32] JVMs on 32
        # cores thrash each other (measured: the 2-shard run was SLOWER
        # than serial before this); local[cores/n] each keeps both
        # sessions inside their budget and also halves shuffle
        # partitions via get_spark's cpus default
        env["SPARK_GRAFT_CPUS"] = str(max(4, (os.cpu_count() or 8) // n))
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", "-m", "not slow", *shard],
                    cwd=REPO,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    env=env,
                ),
                log,
            )
        )
    rc = 0
    for i, (p, log) in enumerate(procs):
        code = p.wait()
        log.close()
        tail = Path(f"/tmp/fast_tier_shard{i}.log").read_text().strip().splitlines()
        print(f"shard {i}: exit {code} | {tail[-1] if tail else '(no output)'}")
        rc = rc or code
    print(f"total wall: {time.time() - t0:.0f}s")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
