"""Quiet-window watcher for the scaling series.

The shared host alternates between a delivered-cores regime and hour-long
starved regimes where every hi-vs-lo pair inverts (see BASELINE.md
"Why N=2 vs 4N=8"). This watcher probes single-thread CPU delivery every
PROBE_EVERY_S; after QUIET_NEEDED consecutive quiet probes it fires ONE
full-pipeline scaling series (tools/bench_scaling.py) and appends the
result to OUT. It stops on the first series with efficiency >= TARGET, or
after MAX_FIRES attempts, or at DEADLINE_S.

While a series is in flight the lockfile /tmp/scaling_inflight exists —
other work on the box should check it before starting Spark jobs.

Usage: python tools/quiet_scaling_watch.py [out.jsonl]
Env: QS_TARGET (0.8), QS_QUIET_S (0.45), QS_PROBE_EVERY_S (180),
     QS_MAX_FIRES (4), QS_DEADLINE_S (10800), QS_ROWS (24000),
     QS_ROUNDS (2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = sys.argv[1] if len(sys.argv) > 1 else "scaling_watch.jsonl"
TARGET = float(os.environ.get("QS_TARGET", "0.8"))
QUIET_S = float(os.environ.get("QS_QUIET_S", "0.45"))
PROBE_EVERY_S = float(os.environ.get("QS_PROBE_EVERY_S", "180"))
QUIET_NEEDED = int(os.environ.get("QS_QUIET_NEEDED", "2"))
MAX_FIRES = int(os.environ.get("QS_MAX_FIRES", "4"))
DEADLINE_S = float(os.environ.get("QS_DEADLINE_S", "10800"))
LOCK = "/tmp/scaling_inflight"


def spin() -> float:
    t = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return time.perf_counter() - t


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> int:
    start = time.time()
    quiet_streak = 0
    fires = 0
    while time.time() - start < DEADLINE_S and fires < MAX_FIRES:
        s = spin()
        quiet_streak = quiet_streak + 1 if s < QUIET_S else 0
        log(f"probe {s:.3f}s streak {quiet_streak}")
        if quiet_streak >= QUIET_NEEDED:
            quiet_streak = 0
            fires += 1
            log(f"quiet window — firing series #{fires}")
            open(LOCK, "w").write(str(os.getpid()))
            try:
                env = dict(os.environ,
                           SCALING_IMAGE_ROWS=os.environ.get("QS_ROWS", "24000"),
                           SCALING_ROUNDS=os.environ.get("QS_ROUNDS", "2"))
                p = subprocess.run(
                    [sys.executable, os.path.join(HERE, "bench_scaling.py")],
                    capture_output=True, text=True, env=env, timeout=3600)
                line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
                res = json.loads(line)
            except Exception as e:  # noqa: BLE001 — record and keep watching
                res = {"error": repr(e)}
            finally:
                try:
                    os.remove(LOCK)
                except OSError:
                    pass
            res["fired_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
            res["probe_before_s"] = s
            with open(OUT, "a") as f:
                f.write(json.dumps(res) + "\n")
            eff = res.get("scaling_efficiency")
            log(f"series #{fires}: efficiency={eff}")
            if isinstance(eff, (int, float)) and eff >= TARGET:
                log("target met — stopping")
                return 0
        time.sleep(PROBE_EVERY_S)
    log("deadline or max fires reached")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
