#!/usr/bin/env bash
# Automated on-chip measurement queue (PERF.md "Round 4 (cont.)"): waits for
# the tunneled TPU to come back, then runs the staged A/B harnesses in
# priority order, logging to chipqueue/ and collecting each harness's final
# JSON stdout line into chipqueue/results.jsonl.
#
# Priority order (cheapest decision-value first, in case the link flaps):
#   1. bench_kernels.py            — Pallas gather/scatter microbenches with
#                                    the honest chained-D2H timing discipline
#   2. bench_block_ab.py           — block-coalescing go/no-go (VERDICT r3 #5)
#   3. bench.py A/B set            — sorted wire / Pallas scatter / AdaGrad
#                                    deltas vs the round-3 dedup headline
#   4. bench_serving_ab.py         — versioned serial-vs-pipelined eval A/B
#   5. bench.py (full)             — headline + eval + steady-state regimes
#   6. bench_pressure.py           — full-table HBM oracle vs 30%/10% capacity
#
# Usage: ./chip_queue.sh [outdir]   (default outdir: chipqueue)
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

echo "[queue] waiting for TPU link..." >&2
n=0
until probe; do
    n=$((n + 1))
    echo "[queue] probe $n failed ($(date -u +%H:%M:%S)); retry in 120s" >&2
    sleep 120
done
echo "[queue] TPU live after $n failed probes ($(date -u +%H:%M:%S))" >&2

FAILED=()

run() {
    local name="$1" tmo="$2" attempt="${ATTEMPT:-1}"
    shift 2
    echo "[queue] >>> $name (attempt $attempt): $* ($(date -u +%H:%M:%S))" >&2
    local t0=$SECONDS
    if timeout "$tmo" env "$@" >"$OUT/$name.out" 2>"$OUT/$name.log"; then
        echo "[queue] <<< $name ok in $((SECONDS - t0))s" >&2
        # the contract: each harness's final stdout line is the JSON
        # result — validate before interpolating so one stray stdout line
        # cannot corrupt the whole results.jsonl
        local last
        last="$(tail -n 1 "$OUT/$name.out")"
        if printf '%s' "$last" | python -c 'import json,sys; json.loads(sys.stdin.read())' 2>/dev/null; then
            printf '{"harness": "%s", "attempt": %s, "result": %s}\n' \
                "$name" "$attempt" "$last" >>"$RESULTS"
        else
            echo "[queue] $name: last stdout line is not JSON (see $OUT/$name.out)" >&2
            printf '{"harness": "%s", "attempt": %s, "result": null, "bad_output": true}\n' \
                "$name" "$attempt" >>"$RESULTS"
        fi
    else
        echo "[queue] <<< $name FAILED/timeout after $((SECONDS - t0))s (see $OUT/$name.log)" >&2
        printf '{"harness": "%s", "attempt": %s, "result": null, "error": true}\n' \
            "$name" "$attempt" >>"$RESULTS"
        FAILED+=("$name $tmo $*")
    fi
}

pass() {
    run kernels        3600  python bench_kernels.py
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

pass

# one retry round for tunnel-flap casualties: wait for the link again, then
# re-run each failed harness once
if [ "${#FAILED[@]}" -gt 0 ]; then
    echo "[queue] ${#FAILED[@]} harness(es) failed; waiting for link to retry" >&2
    until probe; do
        echo "[queue] retry probe failed ($(date -u +%H:%M:%S)); retry in 120s" >&2
        sleep 120
    done
    RETRY=("${FAILED[@]}")
    FAILED=()
    for spec in "${RETRY[@]}"; do
        # shellcheck disable=SC2086
        ATTEMPT=2 run $spec
    done
fi

python chip_queue_finalize.py "$RESULTS" >&2 || true
echo "[queue] done, ${#FAILED[@]} still failed ($(date -u +%H:%M:%S)); results in $RESULTS" >&2
