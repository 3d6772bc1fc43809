"""Render chipqueue/results.jsonl as a comparison table against the
round-3 reference numbers (BENCH_r03.json) — the integration step after
chip_queue.sh finishes.

Usage: python chip_queue_report.py [chipqueue/results.jsonl]
"""

import json
import os
import sys

R03 = {"device_step_ms": 10.73, "examples_per_sec": 249485.4,
       "ms_per_iter": 16.42}  # BENCH_r03.json parsed line


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "chipqueue/results.jsonl"
    if not os.path.exists(path):
        print(f"no results at {path}")
        return 1
    rows = [json.loads(l) for l in open(path) if l.strip()]
    print(f"{'harness':<18} {'att':<3} {'key figures':<60}")
    print("-" * 84)
    for r in rows:
        res = r.get("result")
        if res is None:
            tag = "BAD OUTPUT" if r.get("bad_output") else "FAILED"
            print(f"{r['harness']:<18} {r.get('attempt', 1):<3} {tag}")
            continue
        name = r["harness"]
        if isinstance(res, dict) and "device_step_ms" in res:
            d = res["device_step_ms"]
            ms = res.get("ms_per_iter")
            eps = res.get("value")
            delta = f"{d / R03['device_step_ms']:.3f}x r03-device-step"
            fig = (f"device_step {d} ms ({delta}); {eps} ex/s; "
                   f"{ms} ms/it")
            ss = res.get("steady_state_examples_per_sec")
            if ss:
                fig += (f"; steady {ss} ex/s, overhead "
                        f"{res.get('steady_caching_overhead_ms_per_iter', res.get('caching_overhead_ms_per_iter'))} ms/it")
        elif isinstance(res, dict) and "B_over_A" in res:
            fig = (f"stream={res.get('stream')}: B/A={res['B_over_A']} "
                   f"(A={res.get('per_step_ms_A_dedup')} ms, "
                   f"B={res.get('per_step_ms_B_coalesced')} ms)")
        elif isinstance(res, dict) and res.get("metric") == "serving_pipeline_ab":
            fig = (f"serial={res.get('serial_examples_per_sec')} "
                   f"pipelined={res.get('pipelined_examples_per_sec')} ex/s "
                   f"({res.get('speedup')}x, hit={res.get('eval_hit_rate')})")
        elif isinstance(res, dict) and res.get("metric") == "pressure_auc_gap":
            fig = (f"gap={res.get('pressure_auc_gap')} "
                   f"real={res.get('pressure_real')}")
        else:
            fig = json.dumps(res)[:58]
        print(f"{name:<18} {r.get('attempt', 1):<3} {fig}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
