"""Post-queue artifact extraction: lift selected harness results out of
chipqueue/results.jsonl into the round-4 judge-facing artifact files
(last successful attempt wins). Idempotent; run by chip_queue.sh after the
pass, or by hand.

Usage: python chip_queue_finalize.py [chipqueue/results.jsonl]
"""

import json
import os
import sys

ARTIFACTS = {
    # round-5 queue (chip_queue3.sh); the block A/B is MERGED-only (both
    # arms below) — a single-arm row here would never fire
    "pressure": "PRESSURE_r05.json",
    "serving_ab": "SERVING_r05.json",
    "headline": "HEADLINE_r05.json",
    "ss_prestage_off": "SS_PRESTAGE_OFF_r05.json",
    "ab_pscatter": "PSCATTER_AB_r05.json",
}

# harness pairs merged into ONE artifact: {out: {arm_name: harness}}
MERGED = {
    "BLOCK_STEP_AB_r05.json": {
        "coalesced": "ab_block_auto",
        "per_step": "ab_block_off",
    },
}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "chipqueue/results.jsonl"
    if not os.path.exists(path):
        print(f"no results at {path}")
        return 1
    latest = {}
    for line in open(path):
        if not line.strip():
            continue
        r = json.loads(line)
        if r.get("result") is not None:
            # pass-2 records carry every JSON stdout line under "results";
            # keep the full list so multi-line harnesses (block_ab's two
            # streams, kernels' per-kernel rows) land whole in the artifact
            payload = r.get("results", r["result"])
            if isinstance(payload, list) and len(payload) == 1:
                payload = payload[0]
            latest[r["harness"]] = payload
    wrote = 0
    for out, arms in MERGED.items():
        have = {a: h for a, h in arms.items() if h in latest}
        if len(have) == len(arms):
            with open(out, "w") as f:
                json.dump({a: latest[h] for a, h in arms.items()}, f,
                          indent=1)
                f.write("\n")
            print(f"wrote {out}")
            wrote += 1
        elif have:
            # one arm landed, one didn't: say so LOUDLY — the successful
            # measurement would otherwise vanish from every artifact
            missing = sorted(set(arms.values()) - set(have.values()))
            print(
                f"!!! {out} NOT written: arm(s) {missing} missing from "
                f"{path} (have {sorted(have.values())}) — rerun the "
                f"missing harness or extract by hand", file=sys.stderr,
            )
    for harness, out in ARTIFACTS.items():
        if harness in latest and out not in MERGED:
            with open(out, "w") as f:
                json.dump(latest[harness], f, indent=1)
                f.write("\n")
            print(f"wrote {out}")
            wrote += 1
    if not wrote:
        print("no artifact-mapped harness results yet")
    return 0


if __name__ == "__main__":
    sys.exit(main())
