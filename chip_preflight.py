#!/usr/bin/env python
"""Chip-queue pre-flight: run each queued harness's CPU smoke BEFORE any
chip time is spent (VERDICT r4 item 6 — a broken harness must never burn
a chip window on a traceback again; round 4 lost ~25 min of its final TPU
window to a bench.py unpack regression that the CPU smoke catches in
seconds).

Writes a JSON verdict map {harness: {"ok": bool, "seconds": float,
"detail": str}} to the path given as argv[1] (default
chipqueue/preflight.json). chip_queue3.sh consults it per harness and
SKIPS (loudly, with a results.jsonl record) any harness whose smoke
failed. Exit code is 0 unless --strict is passed (then 1 if any smoke
failed) — the queue must still run the healthy harnesses.

The smoke for each bench.py harness is the SAME env with BENCH_CPU=1
(in-process CPU backend at tiny geometry — tests/test_bench_harnesses.py
runs the same thing in the suite); the other harnesses expose their own
*_CPU knobs. ``--inject-fail NAME`` adds a synthetic always-failing
harness — the hook the gate's own test uses.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# harness name -> (env overrides, argv) for its CPU smoke. Keep in sync
# with chip_queue3.sh's queue list; every queued harness MUST have a row
# here (the queue refuses to run a harness with no pre-flight verdict).
SMOKES = {
    "ab_block_auto": (
        {"BENCH_CPU": "1", "BENCH_SKIP_EXTRAS": "1", "BENCH_DEDUP": "on",
         "BENCH_PACK": "0"},
        [sys.executable, "bench.py"],
    ),
    "ab_block_off": (
        {"BENCH_CPU": "1", "BENCH_SKIP_EXTRAS": "1", "BENCH_DEDUP": "on",
         "BENCH_PACK": "0", "BENCH_BLOCK": "0"},
        [sys.executable, "bench.py"],
    ),
    "ab_pscatter": (
        # the chip run needs real-TPU Pallas; the smoke runs the same
        # step integration in interpret mode via the test suite's knob
        {"BENCH_CPU": "1", "BENCH_SKIP_EXTRAS": "1", "BENCH_DEDUP": "on",
         "BENCH_PSCATTER": "1", "BENCH_PALLAS_INTERPRET": "1"},
        [sys.executable, "bench.py"],
    ),
    "ab_dedup_base": (
        {"BENCH_CPU": "1", "BENCH_SKIP_EXTRAS": "1", "BENCH_DEDUP": "on"},
        [sys.executable, "bench.py"],
    ),
    "headline": (
        {"BENCH_CPU": "1"},
        [sys.executable, "bench.py"],
    ),
    "ss_prestage_off": (
        {"BENCH_CPU": "1", "BENCH_PRESTAGE": "0"},
        [sys.executable, "bench.py"],
    ),
    "serving_ab": (
        {"SERVINGAB_CPU": "1"},
        [sys.executable, "bench_serving_ab.py"],
    ),
    "pressure": (
        {"PRESSURE_CPU": "1", "PRESSURE_TABLES": "2", "PRESSURE_IDS": "600",
         "PRESSURE_DIM": "8", "PRESSURE_BATCH": "32", "PRESSURE_STEPS": "12"},
        [sys.executable, "bench_pressure.py"],
    ),
    "kernels": (
        {"KERNELS_CPU": "1"},
        [sys.executable, "bench_kernels.py"],
    ),
}

SMOKE_TIMEOUT = int(os.environ.get("PREFLIGHT_TIMEOUT", "900"))


def run_smoke(name, env_extra, argv):
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    try:
        p = subprocess.run(
            argv, cwd=REPO, env=env, capture_output=True, text=True,
            timeout=SMOKE_TIMEOUT,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "seconds": round(time.time() - t0, 1),
                "detail": f"smoke timeout after {SMOKE_TIMEOUT}s"}
    dt = round(time.time() - t0, 1)
    if p.returncode != 0:
        return {"ok": False, "seconds": dt,
                "detail": "rc=%d: %s" % (p.returncode, p.stderr[-1500:])}
    # the queue collects JSON stdout lines; a smoke that prints none would
    # make the chip run's record useless even if it exits 0
    has_json = any(
        line.lstrip().startswith("{") for line in p.stdout.splitlines()
    )
    if not has_json:
        return {"ok": False, "seconds": dt,
                "detail": "no JSON line on stdout"}
    return {"ok": True, "seconds": dt, "detail": ""}


def main():
    argv = sys.argv[1:]
    strict = "--strict" in argv
    argv = [a for a in argv if a != "--strict"]
    inject = []
    while "--inject-fail" in argv:
        i = argv.index("--inject-fail")
        inject.append(argv[i + 1])
        del argv[i: i + 2]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i: i + 2]
    out_path = argv[0] if argv else os.path.join(
        REPO, "chipqueue", "preflight.json"
    )

    smokes = dict(SMOKES)
    for name in inject:
        smokes[name] = ({}, ["false"])  # synthetic failure (gate test hook)
    if only is not None:
        smokes = {k: v for k, v in smokes.items() if k in only}

    verdicts = {}
    for name, (env_extra, argv_s) in smokes.items():
        print(f"[preflight] {name}: {' '.join(argv_s)} ...",
              file=sys.stderr, flush=True)
        v = run_smoke(name, env_extra, argv_s)
        verdicts[name] = v
        status = "ok" if v["ok"] else "FAIL"
        print(f"[preflight] {name}: {status} in {v['seconds']}s"
              + ("" if v["ok"] else f" — {v['detail'][:200]}"),
              file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(verdicts, f, indent=1)
    n_bad = sum(1 for v in verdicts.values() if not v["ok"])
    print(f"[preflight] {len(verdicts) - n_bad}/{len(verdicts)} smokes ok; "
          f"verdicts in {out_path}", file=sys.stderr)
    return 1 if (strict and n_bad) else 0


if __name__ == "__main__":
    sys.exit(main())
