"""Pallas TPU kernels for the cached embedding lookup hot path.

The cached forward's device work is: gather T*B rows from the concatenated
HBM-resident cache (slots precomputed by the host probe, DESIGN.md D1).
XLA's native gather is the production default (train/step.py uses jnp.take);
this kernel is the explicit-DMA alternative: the cache never leaves HBM and
row blocks stream through VMEM with a deep async-copy pipeline. ops/bench of
both against the HBM roofline is in tests/test_ops.py + bench_kernels.py
(SURVEY.md §7 step 7); the faster one wins the hot path via
Config.use_pallas_lookup.

Layout contract: cache [R, D] float32 in HBM; slots int32 [N]; D a multiple
of 128 (lane width). Slot indices arrive via PrefetchScalarGridSpec so DMA
source addresses are known before the kernel body runs.

gather_rows(cache, slots) -> [N, D]: jnp.take(axis=0) drop-in with a custom
VJP that scatter-adds into a cache-shaped zero cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; x NBUF in-flight single-row DMAs
_BLOCK_ROWS = 1024
_NBUF = 8


def _gather_block_kernel(slots_ref, cache_hbm, out_ref, scratch, sems):
    """Grid step i emits rows [i*blk, (i+1)*blk) of the output: a depth-_NBUF
    rolling window of single-row HBM->VMEM DMAs, draining in order."""
    blk = out_ref.shape[0]
    i = pl.program_id(0)
    base = i * blk

    def dma(j):
        buf = j % _NBUF
        return pltpu.make_async_copy(
            cache_hbm.at[slots_ref[base + j]], scratch.at[buf], sems.at[buf]
        )

    # prime the pipeline
    for j in range(_NBUF - 1):
        dma(j).start()

    def body(j, _):
        @pl.when(j + _NBUF - 1 < blk)
        def _():
            dma(j + _NBUF - 1).start()

        dma(j).wait()
        out_ref[j, :] = scratch[j % _NBUF]
        return 0

    jax.lax.fori_loop(0, blk, body, 0)


def _gather_fwd_impl(cache: jax.Array, slots: jax.Array, interpret: bool = False):
    n = slots.shape[0]
    d = cache.shape[1]
    blk = min(_BLOCK_ROWS, n)
    if n % blk != 0:
        raise ValueError(f"slot count {n} must be a multiple of block {blk}")
    grid = (n // blk,)
    return pl.pallas_call(
        _gather_block_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # cache stays in HBM
            out_specs=pl.BlockSpec(
                (blk, d), lambda i, slots: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((_NBUF, d), jnp.float32),
                pltpu.SemaphoreType.DMA((_NBUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), cache.dtype),
        interpret=interpret,
    )(slots, cache)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(cache: jax.Array, slots: jax.Array, interpret: bool = False):
    """Pallas row gather: cache [R, D] (HBM), slots [N] int32 -> [N, D]."""
    return _gather_fwd_impl(cache, slots, interpret)


def _gather_fwd(cache, slots, interpret):
    return _gather_fwd_impl(cache, slots, interpret), (cache.shape, slots)


def _gather_bwd(interpret, res, g):
    cache_shape, slots = res
    dcache = jnp.zeros(cache_shape, g.dtype).at[slots].add(g)
    return dcache, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
