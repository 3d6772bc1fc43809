"""Pallas TPU kernels for the cached sparse update's row scatters.

The dedup-wire sparse update's device cost is dominated by ONE op: the
scatter-add of the per-step unique-row gradient block into the 1.7 GB
HBM-resident cache. XLA's scatter runs at ~102 ns/row once the destination
crosses a ~256->512 MB cliff (PERF.md finding 11) while the explicit-DMA
Pallas row GATHER over the same cache streams at near-HBM-bandwidth
(bench_kernels.py: ~41 us for 106k rows). These kernels apply the same
deep-pipelined single-row-DMA structure to the write side:

- ``scatter_add_rows``: read-modify-write (cache[slot] += delta row), the
  sparse SGD update. Safe ONLY for DISTINCT slots — exactly what the dedup
  wire guarantees (host-coalesced unique rows; cache/host_cache.py
  probe_dedup). Reference semantics anchor: the per-step sparse
  EmbeddingBag grad apply, /root/reference/main_no_ddp.py:374-376,413.
- ``scatter_set_rows``: write-only (cache[slot] = row), the per-step aux
  staging of miss rows (train/step.py stage; reference analog: the cache
  miss side-channel of cache_manager.py). No read DMA at all.

Both take ``nvalid``: rows at positions >= nvalid are trash-row padding
(utils/padding.py pow2 buckets) and are skipped entirely — no DMA, no
race. Valid rows MUST form a prefix (the wire layouts guarantee it:
default = [trash, uniq..., trash...], sorted = [uniq..., trash...], aux =
[slots..., trash...]; position 0's trash in the default layout is counted
valid — its delta row is exactly zero, a masked-lane gradient).

Layout contract: cache [R, D] float32 HBM, aliased in->out (the caller
must be able to donate; XLA inserts a full copy otherwise); slots int32
[U] with U % block == 0 (pow2 buckets satisfy this); D % 128 == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; read/write DMA pipeline depths
_BLOCK_ROWS = 1024
_NRD = 8
_NWR = 8

# rows per pallas_call: the scalar-prefetch ``slots`` operand lives in
# SMEM (~1 MB on v5e), so a single call must not ship more than ~256 KB
# of int32 slot ids — the round-4 chip window's refill-insert AOT failure
# was exactly this (a 2M-slot call staging u8[8388608] into SMEM).
# Larger row blocks are CHUNKED into a chain of aliased calls; 64k rows
# per call matches the headline unique-scatter bucket (one call, the
# measured 140 ns/row regime) and keeps every chunk's slot slice at
# 256 KB.
_MAX_CALL_ROWS = 65536


def _scatter_add_kernel(slots_ref, nv_ref, delta_ref, cache_in, cache_out,
                        rbuf, wbuf, rsems, wsems):
    """Grid step i applies delta rows [i*blk, (i+1)*blk): a depth-_NRD
    rolling window of single-row HBM->VMEM read DMAs, a VPU add into a
    write buffer, and a depth-_NWR window of VMEM->HBM write DMAs.
    cache_in is the aliased input (same buffer as cache_out); all DMA goes
    through cache_out. Writes drain at block end so the next block (and
    kernel exit) never races a buffer still in flight."""
    del cache_in
    blk = delta_ref.shape[0]
    nrd = min(_NRD, blk)
    nwr = min(_NWR, blk)
    base = pl.program_id(0) * blk
    nv = nv_ref[0]

    def rd(j):
        b = j % nrd
        return pltpu.make_async_copy(
            cache_out.at[slots_ref[base + j]], rbuf.at[b], rsems.at[b]
        )

    def wr(j):
        b = j % nwr
        return pltpu.make_async_copy(
            wbuf.at[b], cache_out.at[slots_ref[base + j]], wsems.at[b]
        )

    # prime the read pipeline (valid prefix only)
    for j in range(nrd - 1):
        @pl.when(base + j < nv)
        def _(j=j):
            rd(j).start()

    def body(j, _):
        # refill the read window
        @pl.when((j + nrd - 1 < blk) & (base + j + nrd - 1 < nv))
        def _():
            rd(j + nrd - 1).start()

        # write-buffer reuse: the write started nwr rows ago must land
        # before this row's sum overwrites its buffer
        @pl.when((j >= nwr) & (base + j - nwr < nv))
        def _():
            wr(j - nwr).wait()

        @pl.when(base + j < nv)
        def _():
            rd(j).wait()
            wbuf[j % nwr, :] = rbuf[j % nrd, :] + delta_ref[j, :]
            wr(j).start()

        return 0

    jax.lax.fori_loop(0, blk, body, 0)

    # drain this block's tail writes
    for k in range(nwr):
        j = blk - nwr + k
        @pl.when((j >= 0) & (base + j < nv))
        def _(j=j):
            wr(j).wait()


def _scatter_set_kernel(slots_ref, nv_ref, rows_ref, cache_in, cache_out,
                        wsems):
    """Write-only variant: DMA rows straight from the VMEM input block to
    their cache rows, depth-_NWR in flight. The source block is
    kernel-immutable, so there is no buffer-reuse hazard — only the
    block-end drain (the pipeline emitter must not swap the input block
    while copies are in flight)."""
    del cache_in
    blk = rows_ref.shape[0]
    nwr = min(_NWR, blk)
    base = pl.program_id(0) * blk
    nv = nv_ref[0]

    def wr(j):
        return pltpu.make_async_copy(
            rows_ref.at[j], cache_out.at[slots_ref[base + j]],
            wsems.at[j % nwr],
        )

    def body(j, _):
        @pl.when((j >= nwr) & (base + j - nwr < nv))
        def _():
            wr(j - nwr).wait()

        @pl.when(base + j < nv)
        def _():
            wr(j).start()

        return 0

    jax.lax.fori_loop(0, blk, body, 0)
    for k in range(nwr):
        j = blk - nwr + k
        @pl.when((j >= 0) & (base + j < nv))
        def _(j=j):
            wr(j).wait()


def _check(cache, slots, delta):
    u, d = delta.shape
    if u == 0:
        raise ValueError("empty row block")
    if slots.shape != (u,):
        raise ValueError(f"slots {slots.shape} must be [{u}]")
    if cache.ndim != 2 or cache.shape[1] != d:
        raise ValueError(f"cache {cache.shape} incompatible with D={d}")
    blk = min(_BLOCK_ROWS, u)
    if u % blk != 0:
        raise ValueError(f"row count {u} must be a multiple of block {blk}")
    return blk, d, u


def _chunks(u, blk, max_call_rows):
    """Per-call row counts: one call when the slot slice fits SMEM, else
    equal chunks of the largest divisor of ``u`` that is <= max_call_rows
    and a multiple of ``blk`` (pow2 buckets always divide cleanly)."""
    if u <= max_call_rows:
        return u
    if max_call_rows < blk:
        raise ValueError(
            f"max_call_rows {max_call_rows} must be >= the kernel row "
            f"block {blk} when chunking (u={u})"
        )
    c = max_call_rows - max_call_rows % blk
    while c > blk and u % c:
        c -= blk
    return c


def scatter_add_rows(cache, slots, delta, nvalid=None, interpret=False,
                     max_call_rows=_MAX_CALL_ROWS):
    """cache[slots[i]] += delta[i] for i < nvalid; slots[:nvalid] MUST be
    distinct rows (the dedup-wire contract — duplicate slots race the RMW).
    Drop-in for ``cache.at[slots].add(delta)`` under that contract; returns
    the updated cache (input aliased — donate it).

    Row blocks beyond ``max_call_rows`` are chunked into a chain of
    aliased calls (SMEM scalar-prefetch budget — see _MAX_CALL_ROWS);
    ``nvalid`` distributes across chunks as a clamped prefix, so chunks
    entirely past the valid prefix issue zero DMAs."""
    blk, d, u = _check(cache, slots, delta)
    c = _chunks(u, blk, max_call_rows)
    if c < u:
        nv = u if nvalid is None else nvalid
        for off in range(0, u, c):
            cache = scatter_add_rows(
                cache, jax.lax.slice(slots, (off,), (off + c,)),
                jax.lax.slice(delta, (off, 0), (off + c, d)),
                jnp.clip(nv - off, 0, c), interpret=interpret,
                max_call_rows=max_call_rows,
            )
        return cache
    nv = jnp.full((1,), u if nvalid is None else nvalid, jnp.int32)
    return pl.pallas_call(
        _scatter_add_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(u // blk,),
            in_specs=[
                pl.BlockSpec((blk, d), lambda i, slots, nv: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # cache stays in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((min(_NRD, blk), d), jnp.float32),
                pltpu.VMEM((min(_NWR, blk), d), jnp.float32),
                pltpu.SemaphoreType.DMA((min(_NRD, blk),)),
                pltpu.SemaphoreType.DMA((min(_NWR, blk),)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # flattened-arg index: [slots, nv, delta, cache] -> cache is 3
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slots, nv, delta, cache)


def scatter_set_rows(cache, slots, rows, nvalid=None, interpret=False,
                     max_call_rows=_MAX_CALL_ROWS):
    """cache[slots[i]] = rows[i] for i < nvalid; slots[:nvalid] MUST be
    distinct (duplicates would be last-writer-wins nondeterministic).
    Drop-in for ``cache.at[slots].set(rows)`` under that contract.
    Chunked past ``max_call_rows`` exactly like scatter_add_rows (the
    refill-insert site ships multi-million-row blocks)."""
    blk, d, u = _check(cache, slots, rows)
    c = _chunks(u, blk, max_call_rows)
    if c < u:
        nv = u if nvalid is None else nvalid
        for off in range(0, u, c):
            cache = scatter_set_rows(
                cache, jax.lax.slice(slots, (off,), (off + c,)),
                jax.lax.slice(rows, (off, 0), (off + c, d)),
                jnp.clip(nv - off, 0, c), interpret=interpret,
                max_call_rows=max_call_rows,
            )
        return cache
    nv = jnp.full((1,), u if nvalid is None else nvalid, jnp.int32)
    return pl.pallas_call(
        _scatter_set_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(u // blk,),
            in_specs=[
                pl.BlockSpec((blk, d), lambda i, slots, nv: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((min(_NWR, blk),)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slots, nv, rows, cache)
