"""Kernel microbenchmarks vs HBM roofline (SURVEY.md §7 step 7).

Compares the Pallas explicit-DMA row gather (ops/lookup.py) against XLA's
native gather (jnp.take) and the HBM roofline for the cached-lookup shape,
plus the dot-interaction. Run on the real chip; prints one JSON line per
kernel.
"""

import json
import os
import sys
import time

import numpy as np

# v5e (16GB) HBM bandwidth; override per generation if needed
HBM_GBPS = 819.0


def log(msg):
    print(f"[bench_kernels] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    # KERNELS_CPU=1: bitrot smoke for the chip queue's first harness —
    # forces the CPU backend in-process (sitecustomize pre-registers the
    # TPU backend; a down tunnel would hang the probe), shrinks every
    # shape, and runs the Pallas kernels in interpret mode. Numbers are
    # meaningless; only the flow + JSON contract are under test.
    SMOKE = bool(os.environ.get("KERNELS_CPU"))
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cdlrm_tpu.ops.lookup import gather_rows

    rng = np.random.Generator(np.random.SFC64(0))
    rows, d = (20_000, 128) if SMOKE else (1_000_000, 128)
    # smoke n: the Pallas gather tiles slots in 1024-blocks
    n = 2048 if SMOKE else 26 * 4096  # bench lookup volume per step
    log("staging cache (512MB H2D)...")
    cache = jnp.asarray(rng.random((rows, d), dtype=np.float32))
    jax.block_until_ready(cache)
    log("cache staged")

    take = lambda c, s: jnp.take(c, s, axis=0)
    pallas_gather = lambda c, s: gather_rows(c, s, interpret=SMOKE)

    # honest chained timing (PERF.md finding 7: block_until_ready returns
    # early on tunneled backends; finding 10: identical operands get CSE'd
    # — so chain ITERS gathers over DISTINCT slot sets inside one jitted
    # scan with a scalar dependency, and end on a real D2H)
    CHAIN = 2 if SMOKE else 10
    slots_iter = jnp.asarray(
        rng.integers(0, rows, (CHAIN, n)).astype(np.int32))

    def timeit_gather(fn, iters=1 if SMOKE else 5):
        @jax.jit
        def run(c, ss):
            def body(acc, s):
                # consume EVERY gathered row or XLA shrinks the gather to
                # the consumed lanes (finding 10 DCE discipline); the sum
                # may fuse into XLA's take (no [N,D] write) — the same
                # fusion the real step's pooling gets, so it's fair
                return acc + jnp.sum(fn(c, s)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), ss)
            return acc
        _ = float(run(cache, slots_iter))
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(run(cache, slots_iter))
        return (time.perf_counter() - t0) / (iters * CHAIN)

    bytes_moved = n * d * 4 * 2  # read + write
    results = []
    for name, fn in [("xla_take", take), ("pallas_gather", pallas_gather)]:
        try:
            log(f"compiling+timing {name}...")
            dt = timeit_gather(fn)
            log(f"{name}: {dt*1e6:.0f} us")
            results.append(
                {
                    "kernel": f"lookup_gather/{name}",
                    "us": round(dt * 1e6, 1),
                    "gbps": round(bytes_moved / dt / 1e9, 1),
                    "roofline_frac": round(bytes_moved / dt / 1e9 / HBM_GBPS, 3),
                }
            )
        except Exception as e:
            results.append({"kernel": f"lookup_gather/{name}", "error": str(e)[:200]})

    # dot interaction at bench shape
    from cdlrm_tpu.models.dlrm import interact_features

    b, t = (64, 26) if SMOKE else (4096, 26)
    x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    ly = jnp.asarray(rng.normal(size=(t, b, d)).astype(np.float32))

    @jax.jit
    def inter_chain(x, ly):
        # chained honest timing: each round perturbs x by the previous
        # round's scalar so XLA cannot CSE the chain into one interaction
        def body(acc, _):
            z = interact_features(x + acc, ly, "dot", False, jnp.bfloat16)
            return jnp.sum(z).astype(jnp.float32) * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=CHAIN)
        return acc

    _ = float(inter_chain(x, ly))
    inter_iters = 1 if SMOKE else 5
    t0 = time.perf_counter()
    for _ in range(inter_iters):
        _ = float(inter_chain(x, ly))
    dt = (time.perf_counter() - t0) / (inter_iters * CHAIN)
    flops = 2 * b * (t + 1) * (t + 1) * d
    results.append(
        {
            "kernel": "dot_interaction/xla_bf16",
            "us": round(dt * 1e6, 1),
            "tflops": round(flops / dt / 1e12, 2),
        }
    )

    # --- sparse-update formulations (PERF.md finding 8: the scatter floor) ---
    # chained-donation timing: block_until_ready can return early on tunneled
    # backends, so chain N donated calls and end on a scalar D2H
    def timeit_scatter(body, args, iters=2 if SMOKE else 10):
        from jax.sharding import PartitionSpec as P

        from cdlrm_tpu.parallel.mesh import DP_AXIS, make_dp_mesh

        mesh = make_dp_mesh(1)
        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(DP_AXIS),) + tuple(P(None) for _ in args),
            out_specs=P(DP_AXIS), check_vma=False)
        f = jax.jit(sm, donate_argnums=(0,))
        c = jnp.zeros((R_CACHE, DIMS), jnp.float32)
        c = f(c, *args); c = f(c, *args); _ = float(c[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(c, *args)
        _ = float(c[0, 0])
        return (time.perf_counter() - t0) / iters

    R_CACHE, DIMS, N_UPD = (
        (80_000, 128, 26 * 64) if SMOKE else (3_520_000, 128, 26 * 4096)
    )
    UB = 1 << 10 if SMOKE else 1 << 16
    rngs = np.random.Generator(np.random.SFC64(0))
    u = rngs.random(N_UPD, dtype=np.float32)
    slots_np = np.minimum(
        np.exp(u * np.log(R_CACHE - 2)).astype(np.int64), R_CACHE - 2
    ).astype(np.int32)
    uniq_np = np.unique(slots_np)
    uniq_pad = np.full(UB, R_CACHE - 1, np.int32)
    uniq_pad[: uniq_np.size] = uniq_np
    ginv_np = np.searchsorted(uniq_np, slots_np).astype(np.int32)
    slots_d = jnp.asarray(slots_np)
    uniq_d = jnp.asarray(uniq_pad)
    ginv_d = jnp.asarray(ginv_np)
    grads = jnp.asarray(rngs.random((N_UPD, DIMS), np.float32))

    dt = timeit_scatter(lambda c, s, g: c.at[s].add(g), (slots_d, grads))
    results.append({"kernel": f"scatter_add/{N_UPD}_dup_rows",
                    "ms": round(dt * 1e3, 2),
                    "ns_per_update": round(dt * 1e9 / N_UPD, 1)})

    def seg(c, gi, uq, g):
        su = jnp.zeros((UB, DIMS), g.dtype).at[gi].add(g)
        return c.at[uq].add(su)

    dt = timeit_scatter(seg, (ginv_d, uniq_d, grads))
    results.append({"kernel": f"scatter_add/segsum_{UB}_unique",
                    "ms": round(dt * 1e3, 2),
                    "unique": int(uniq_np.size)})

    # --- Pallas DMA scatter vs XLA scatter (round-4: ops/scatter.py) ---
    # The step's dominant op: scatter-add the [U, D] unique-row grad block
    # into the 3.5M-row cache. XLA pays the ~102 ns/row above-cliff rate
    # (finding 11); the DMA kernel streams read+write rows at the same
    # pipelined single-row-DMA structure the gather runs at near-BW.
    from cdlrm_tpu.ops.scatter import scatter_add_rows, scatter_set_rows

    du = jnp.asarray(rngs.random((UB, DIMS), np.float32))
    nv_rows = int(uniq_np.size)

    dt = timeit_scatter(lambda c, uq, g: c.at[uq].add(g), (uniq_d, du))
    results.append({"kernel": f"uniq_scatter_add/xla_{UB}_bucket",
                    "ms": round(dt * 1e3, 2), "unique": nv_rows,
                    "ns_per_row": round(dt * 1e9 / nv_rows, 1)})
    try:
        dt = timeit_scatter(
            lambda c, uq, g: scatter_add_rows(c, uq, g, nv_rows,
                                              interpret=SMOKE),
            (uniq_d, du))
        results.append({"kernel": f"uniq_scatter_add/pallas_{UB}_bucket",
                        "ms": round(dt * 1e3, 2), "unique": nv_rows,
                        "ns_per_row": round(dt * 1e9 / nv_rows, 1)})
    except Exception as e:
        results.append({"kernel": "uniq_scatter_add/pallas", "error": str(e)[:300]})

    # aux staging: B=4096 distinct rows written (no read) per step
    aux_n = 256 if SMOKE else 4096
    aux_slots_d = jnp.asarray(
        rngs.permutation(R_CACHE - 1)[:aux_n].astype(np.int32))
    aux_rows_d = jnp.asarray(rngs.random((aux_n, DIMS), np.float32))
    dt = timeit_scatter(lambda c, s, r: c.at[s].set(r),
                        (aux_slots_d, aux_rows_d))
    results.append({"kernel": f"aux_scatter_set/xla_{aux_n}",
                    "ms": round(dt * 1e3, 2),
                    "ns_per_row": round(dt * 1e9 / aux_n, 1)})
    try:
        dt = timeit_scatter(
            lambda c, s, r: scatter_set_rows(c, s, r, interpret=SMOKE),
            (aux_slots_d, aux_rows_d))
        results.append({"kernel": f"aux_scatter_set/pallas_{aux_n}",
                        "ms": round(dt * 1e3, 2),
                        "ns_per_row": round(dt * 1e9 / aux_n, 1)})
    except Exception as e:
        results.append({"kernel": "aux_scatter_set/pallas", "error": str(e)[:300]})

    # --- destination-size sweep (round-4: the block-coalescing question) ---
    # The block-coalescing formulation (VERDICT r3 item 5) accumulates each
    # step's sparse delta into a [U_block, D] pending buffer and scatters the
    # cache ONCE per scan block. It only wins if scatter-add into the SMALL
    # pending operand is cheaper per row than into the full cache — i.e. if
    # the ~92 ns/row rate (finding 8/10, measured 65k..3.5M destination rows)
    # falls off for VMEM-sized destinations (the hot tier's [2048, 128] 1 MB
    # buffer measured ~8 ns/row). This sweep locates the cliff.
    dests = (256, 1024) if SMOKE else (
        1024, 2048, 4096, 8192, 16384, 65536, 262144)
    for u_dest in dests:
        dest_slots = jnp.asarray((slots_np % (u_dest - 1)).astype(np.int32))

        def body(c, s, g, u=u_dest):
            pend = jnp.zeros((u, DIMS), jnp.float32).at[s].add(g)
            # consume pending via a 1-row add so XLA cannot DCE it
            return c.at[0:1].add(pend[:1])

        dt = timeit_scatter(body, (dest_slots, grads))
        results.append({
            "kernel": f"scatter_add/{N_UPD}_rows_into_{u_dest}_dest",
            "ms": round(dt * 1e3, 2),
            "ns_per_update": round(dt * 1e9 / N_UPD, 1),
        })

    # --- finding 10 (PERF.md round 3): jnp.searchsorted's default 'scan'
    # method lowers to log-many SERIAL dependent gather rounds on TPU ---
    H = 256 if SMOKE else 2048
    hot_d = jnp.asarray(
        np.sort(rngs.choice(R_CACHE - 2, H, replace=False).astype(np.int32))
    )

    def timeit_chained_scalar(body, iters=1 if SMOKE else 3,
                              inner=2 if SMOKE else 10):
        @jax.jit
        def run(s):
            def f(acc, _):
                return acc + body(), None
            acc, _ = jax.lax.scan(f, s, None, length=inner)
            return acc
        s = run(jnp.int32(0)); _ = int(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = run(s)
        _ = int(s)
        return (time.perf_counter() - t0) / (iters * inner)

    for method in ("scan", "sort"):
        dt = timeit_chained_scalar(
            lambda m=method: jnp.searchsorted(hot_d, slots_d, method=m).sum()
        )
        results.append({
            "kernel": f"searchsorted/{N_UPD}_keys_in_{H}/{method}",
            "ms": round(dt * 1e3, 2),
        })

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
