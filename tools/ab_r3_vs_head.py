"""Interleaved A/B: round-3 code (2513fd2, worktree) vs HEAD on the
bench suite — r4 verdict item #2. The r4 suite ran ~1.3-1.8x slower
than r3 across UNCHANGED queries; the noise explanation was plausible
but unmeasured because nobody ran both code versions in one window.

Protocol (BENCH.md median-of-3 interleave): alternate fresh-JVM
subprocess bench runs A,B,A,B,A,B in ONE window, serialized (never two
Spark JVMs at once — the host shows 2.7x window noise and multi-JVM
collapse). Per-query medians per side, then the ratio. SPARK_GRAFT_
ROUNDS=1 inside each run (the interleave supplies the replication).

Usage: python tools/ab_r3_vs_head.py [r3_worktree] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

HEAD = Path(__file__).resolve().parent.parent


def run_bench(repo: Path, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_ROUNDS="1")
    out = subprocess.run(
        [sys.executable, str(repo / "bench.py")], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800)
    last = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            last = line
    if last is None:
        raise RuntimeError(f"no bench JSON from {repo}:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-2000:]}")
    return json.loads(last)


def main():
    r3 = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/r3code")
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    samples: dict[str, dict[str, list[float]]] = {}
    headline: dict[str, list[float]] = {"r3": [], "head": []}
    for i in range(pairs):
        for tag, repo in (("r3", r3), ("head", HEAD)):
            res = run_bench(repo, sf_dir)
            headline[tag].append(res["value"])
            tps = res.get("triples_per_sec")
            print(json.dumps({"pair": i, "side": tag,
                              "total_sec": res["value"],
                              "triples_per_sec": tps}), flush=True)
            for q, sec in res["queries"].items():
                samples.setdefault(q, {}).setdefault(tag, []).append(sec)
    print()
    print("| query | r3 median | HEAD median | HEAD/r3 |")
    print("|---|---|---|---|")
    for q in sorted(samples):
        if len(samples[q]) < 2:
            continue
        m3 = statistics.median(samples[q]["r3"])
        mh = statistics.median(samples[q]["head"])
        ratio = mh / m3 if m3 else float("nan")
        print(f"| {q} | {m3:.2f} | {mh:.2f} | {ratio:.2f} |")
    print(f"\nheadline totals r3={headline['r3']} head={headline['head']}")


if __name__ == "__main__":
    main()
