#!/usr/bin/env bash
# Round-5 on-chip queue. Differences from chip_queue2.sh (round 4):
#   - PRE-FLIGHT GATE (VERDICT r4 item 6): before any chip time is spent,
#     chip_preflight.py runs every queued harness's CPU smoke and writes
#     chipqueue/preflight.json; a harness whose smoke failed is SKIPPED
#     loudly (results.jsonl records {"skipped": "preflight"}) instead of
#     burning a chip window on a traceback (round 4 lost ~25 min that way).
#   - round-5 harness list: the block-coalesce A/B pair (auto vs forced
#     off), the now-compiling pscatter A/B (preceded by a 2-minute AOT
#     compile canary at production shapes), headline, prestage A/B,
#     serving A/B, bench-geometry pressure.
#
# Usage: ./chip_queue3.sh [outdir]   (default outdir: chipqueue)
set -u
cd "$(dirname "$0")"
OUT="${1:-chipqueue}"
mkdir -p "$OUT"
RESULTS="$OUT/results.jsonl"
PREFLIGHT="$OUT/preflight.json"

probe() {
    timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.default_backend() == "tpu"
import jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

# ---- pre-flight: CPU smokes BEFORE waiting for (or touching) the chip ----
# SKIP_PREFLIGHT=1: no smokes, no gating (escape hatch).
# REUSE_PREFLIGHT=1: skip the smoke RUN but keep gating on the existing
#   $PREFLIGHT file (used by the gate's own test; also handy for re-runs).
# PREFLIGHT_ONLY / PREFLIGHT_EXTRA: override the harness list / add
#   chip_preflight.py args (the test injects synthetic failures this way).
if [ "${SKIP_PREFLIGHT:-0}" != "1" ] && [ "${REUSE_PREFLIGHT:-0}" != "1" ]; then
    echo "[queue3] pre-flight: CPU smokes for every queued harness..." >&2
    python chip_preflight.py "$PREFLIGHT" \
        --only "${PREFLIGHT_ONLY:-ab_block_auto,ab_block_off,ab_pscatter,headline,ss_prestage_off,serving_ab,pressure}" \
        ${PREFLIGHT_EXTRA:-} >&2 || true
fi

# ok <name>: 0 iff the pre-flight verdict for <name> is ok; a harness with
# NO verdict is treated as failed (keep chip_preflight.py SMOKES in sync)
ok() {
    python - "$PREFLIGHT" "$1" <<'EOF'
import json, sys
try:
    v = json.load(open(sys.argv[1])).get(sys.argv[2])
except Exception:
    v = None
sys.exit(0 if (v and v.get("ok")) else 1)
EOF
}

if [ "${CHIPQ_NO_PROBE:-0}" != "1" ]; then
    echo "[queue3] waiting for TPU link..." >&2
    n=0
    until probe; do
        n=$((n + 1))
        echo "[queue3] probe $n failed ($(date -u +%H:%M:%S)); retry in 120s" >&2
        sleep 120
    done
    echo "[queue3] TPU live after $n failed probes ($(date -u +%H:%M:%S))" >&2
fi

FAILED=()

run() {
    local name="$1" tmo="$2" attempt="${ATTEMPT:-1}"
    shift 2
    if [ "${SKIP_PREFLIGHT:-0}" != "1" ] && ! ok "$name"; then
        echo "[queue3] !!! $name SKIPPED: its CPU smoke failed pre-flight (see $PREFLIGHT)" >&2
        printf '{"harness": "%s", "attempt": %s, "result": null, "skipped": "preflight"}\n' \
            "$name" "$attempt" >>"$RESULTS"
        return
    fi
    echo "[queue3] >>> $name (attempt $attempt): $* ($(date -u +%H:%M:%S))" >&2
    local t0=$SECONDS
    if timeout "$tmo" env "$@" >"$OUT/$name.out" 2>"$OUT/$name.log"; then
        # rc=0 with NO JSON line is a failure too (harness regressed to
        # log-only output, or stdout got lost on the tunnel): record it
        # loudly and queue the retry — a silent bad_output record would
        # burn the window with no artifact and no signal, the exact
        # failure class the pre-flight exists to prevent
        if python - "$OUT/$name.out" "$name" "$attempt" <<'EOF' >>"$RESULTS"
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
sys.exit(0 if lines else 3)
EOF
        then
            echo "[queue3] <<< $name ok in $((SECONDS - t0))s" >&2
        else
            echo "[queue3] !!! $name exited 0 but printed NO JSON line" \
                 "(see $OUT/$name.out) — queued for retry" >&2
            FAILED+=("$name $tmo $*")
        fi
    else
        echo "[queue3] <<< $name FAILED/timeout after $((SECONDS - t0))s (see $OUT/$name.log)" >&2
        printf '{"harness": "%s", "attempt": %s, "result": null, "error": true}\n' \
            "$name" "$attempt" >>"$RESULTS"
        FAILED+=("$name $tmo $*")
    fi
}

# pscatter AOT canary: compile (never run) both kernels at the production
# refill-insert geometry — the exact round-4 failure mode — before the
# full pscatter harness spends its window. No preflight row needed: it IS
# chip-side and 2 minutes.
pscatter_aot() {
    echo "[queue3] >>> pscatter_aot canary ($(date -u +%H:%M:%S))" >&2
    if timeout 300 python - >"$OUT/pscatter_aot.log" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
from cdlrm_tpu.ops.scatter import scatter_set_rows, scatter_add_rows
R, D, U = 3_538_944, 128, 2_097_152
for fn in (scatter_set_rows, scatter_add_rows):
    jax.jit(lambda c, s, r, nv, fn=fn: fn(c, s, r, nv),
            donate_argnums=(0,)).lower(
        jax.ShapeDtypeStruct((R, D), jnp.float32),
        jax.ShapeDtypeStruct((U,), jnp.int32),
        jax.ShapeDtypeStruct((U, D), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    ).compile()
print("AOT OK")
EOF
    then
        echo "[queue3] <<< pscatter_aot ok" >&2
        return 0
    fi
    echo "[queue3] <<< pscatter_aot FAILED — skipping ab_pscatter (see $OUT/pscatter_aot.log)" >&2
    printf '{"harness": "ab_pscatter", "attempt": 1, "result": null, "skipped": "aot_canary"}\n' >>"$RESULTS"
    return 1
}

pass1() {
    run ab_block_auto   3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on BENCH_PACK=0 python bench.py
    run ab_block_off    3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on BENCH_PACK=0 BENCH_BLOCK=0 python bench.py
    # consult the CPU pre-flight BEFORE spending the AOT canary's chip
    # minutes: a harness run() would skip anyway must not burn the window
    if { [ "${SKIP_PREFLIGHT:-0}" = "1" ] || ok ab_pscatter; } && pscatter_aot; then
        run ab_pscatter 3600  BENCH_SKIP_EXTRAS=1 BENCH_DEDUP=on BENCH_PSCATTER=1 python bench.py
    elif [ "${SKIP_PREFLIGHT:-0}" != "1" ] && ! ok ab_pscatter; then
        echo "[queue3] !!! ab_pscatter SKIPPED: its CPU smoke failed pre-flight (AOT canary not spent)" >&2
        printf '{"harness": "ab_pscatter", "attempt": 1, "result": null, "skipped": "preflight"}\n' >>"$RESULTS"
    fi
    run headline        7200  python bench.py
    run ss_prestage_off 7200  BENCH_PRESTAGE=0 python bench.py
    run serving_ab      3600  python bench_serving_ab.py
    run pressure       14400  python bench_pressure.py
}

# CHIPQ_QUEUE: test hook — replaces the real queue with a custom `run`
# invocation so the gate is testable without a chip or long harnesses
if [ -n "${CHIPQ_QUEUE:-}" ]; then
    eval "$CHIPQ_QUEUE"
else
    pass1
fi

if [ "${#FAILED[@]}" -gt 0 ]; then
    echo "[queue3] ${#FAILED[@]} harness(es) failed; waiting for link to retry" >&2
    until probe; do
        echo "[queue3] retry probe failed ($(date -u +%H:%M:%S)); retry in 120s" >&2
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
echo "[queue3] done, ${#FAILED[@]} still failed ($(date -u +%H:%M:%S)); results in $RESULTS" >&2
