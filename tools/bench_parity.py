"""Same-session A/B: r3-era extraction code vs HEAD on one corpus.

VERDICT r4 ordered this adjudication: the driver bench regressed
23.6 -> 34.1 s between rounds while the three queries the round
optimized got faster, pointing at shared-VM contention rather than a
code regression — but that stayed a hypothesis without a same-session
run. The corpus itself is byte-equivalent across rounds (verified:
make_bench_rows(300) matches r3 except 8 same-length docx rows, zero
text diffs), so this script times the SAME cached corpus under both
code trees, alternating A/B/A/B to cancel monotonic box drift, with
floor probes before and after to characterize the window.

Usage: bench_parity.py [r3_tree] [n_docs] [cpus]
Writes BENCH/parity_r3_head.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def floor_probe() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_floor.py"),
         "2000", "8"],
        capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)["efficiency"]
    return 0.0


def run_tree(tree: str, corpus: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "bench_parity_worker.py"),
         tree, corpus, str(cpus)],
        capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed for {tree}: {out.stderr[-2000:]}")


def main() -> None:
    r3_tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3tree"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    sys.path.insert(0, REPO)
    from scribe_js_spark.fixtures import ensure_bench_corpus

    corpus = ensure_bench_corpus("/tmp/scribe_bench", n_docs)

    rec: dict = {"unix": int(time.time()), "n_docs": n_docs,
                 "cpus": cpus, "corpus": corpus,
                 "floor_before": floor_probe(), "runs": []}
    for tree in (REPO, r3_tree, REPO, r3_tree):
        r = run_tree(tree, corpus, cpus)
        r["label"] = "head" if tree == REPO else "r3"
        rec["runs"].append(r)
    rec["floor_after"] = floor_probe()

    by = {"head": [], "r3": []}
    for r in rec["runs"]:
        by[r["label"]].append(r["extract_best"])
    rec["head_best"] = min(by["head"])
    rec["r3_best"] = min(by["r3"])
    rec["head_vs_r3"] = round(rec["head_best"] / rec["r3_best"], 3)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "parity_r3_head.json"),
              "w") as f:
        f.write(json.dumps(rec, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
