#!/usr/bin/env bash
# Round-4 on-chip queue, pass 2 (kernels already landed in pass 1; see
# chip_queue.sh for the original). Differences from pass 1:
#   - block_ab runs FIRST (its pass-1 failure was an HTTP 413 from
#     closure-constant lowering, fixed at fe4f6c5) instead of after the
#     4-hour pressure harness in the retry round;
#   - each results.jsonl record now carries ALL of the harness's JSON
#     stdout lines under "results" (multi-line harnesses were losing
#     everything but the last line), with "result" kept as the last
#     line for chip_queue_report.py compatibility.
#
# Usage: ./chip_queue2.sh [outdir]   (default outdir: chipqueue)
set -u
cd "$(dirname "$0")"
OUT="${1:-chipqueue}"
mkdir -p "$OUT"
RESULTS="$OUT/results.jsonl"

probe() {
    timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.default_backend() == "tpu"
import jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

echo "[queue2] waiting for TPU link..." >&2
n=0
until probe; do
    n=$((n + 1))
    echo "[queue2] probe $n failed ($(date -u +%H:%M:%S)); retry in 120s" >&2
    sleep 120
done
echo "[queue2] TPU live after $n failed probes ($(date -u +%H:%M:%S))" >&2

FAILED=()

run() {
    local name="$1" tmo="$2" attempt="${ATTEMPT:-2}"
    shift 2
    echo "[queue2] >>> $name (attempt $attempt): $* ($(date -u +%H:%M:%S))" >&2
    local t0=$SECONDS
    if timeout "$tmo" env "$@" >"$OUT/$name.out" 2>"$OUT/$name.log"; then
        echo "[queue2] <<< $name ok in $((SECONDS - t0))s" >&2
        python - "$OUT/$name.out" "$name" "$attempt" <<'EOF' >>"$RESULTS"
import json, sys
lines = []
for raw in open(sys.argv[1]):
    raw = raw.strip()
    if not raw.startswith("{"):
        continue
    try:
        lines.append(json.loads(raw))
    except ValueError:
        pass
rec = {"harness": sys.argv[2], "attempt": int(sys.argv[3])}
if lines:
    rec["result"] = lines[-1]
    rec["results"] = lines
else:
    rec["result"] = None
    rec["bad_output"] = True
print(json.dumps(rec))
EOF
    else
        echo "[queue2] <<< $name FAILED/timeout after $((SECONDS - t0))s (see $OUT/$name.log)" >&2
        printf '{"harness": "%s", "attempt": %s, "result": null, "error": true}\n' \
            "$name" "$attempt" >>"$RESULTS"
        FAILED+=("$name $tmo $*")
    fi
}

pass2() {
    run block_ab       5400  python bench_block_ab.py
    run ab_dedup_base  3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on python bench.py
    run ab_sorted      3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on BENCH_PACK=0 BENCH_SORTED=1 python bench.py
    run ab_unsorted_up 3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on BENCH_PACK=0 python bench.py
    run ab_pscatter    3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on BENCH_PSCATTER=1 python bench.py
    run ab_adagrad     3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on BENCH_OPT=adagrad python bench.py
    run serving_ab     3600  python bench_serving_ab.py
    run headline       7200  python bench.py
    run ss_prestage_off 7200 BENCH_PRESTAGE=0 python bench.py
    run pressure      14400  python bench_pressure.py
}

pass2

if [ "${#FAILED[@]}" -gt 0 ]; then
    echo "[queue2] ${#FAILED[@]} harness(es) failed; waiting for link to retry" >&2
    until probe; do
        echo "[queue2] retry probe failed ($(date -u +%H:%M:%S)); retry in 120s" >&2
        sleep 120
    done
    RETRY=("${FAILED[@]}")
    FAILED=()
    for spec in "${RETRY[@]}"; do
        # shellcheck disable=SC2086
        ATTEMPT=3 run $spec
    done
fi

python chip_queue_finalize.py "$RESULTS" >&2 || true
echo "[queue2] done, ${#FAILED[@]} still failed ($(date -u +%H:%M:%S)); results in $RESULTS" >&2
