"""Embedding compression tricks: quotient-remainder and mixed-dimension.

Functional JAX re-implementations of the reference's ``tricks/`` package:
- QR (/root/reference/tricks/qr_embedding_bag.py:25-185): two tables
  [ceil(n/c), d] and [c, d] indexed by quotient/remainder, combined by
  mult/add/concat.
- MD (/root/reference/tricks/md_embedding_bag.py): per-table dim from the
  alpha-power rule (md_solver), small-dim table + linear projection to the
  base dim (PrEmbeddingBag).

Documented deviations from the reference (intent-preserving fixes):
- QR init: the reference calls ``nn.init.uniform_(w, sqrt(1/n))`` which sets
  low=sqrt(1/n), high=1.0 (an upstream bug); we use the symmetric
  uniform(-sqrt(1/n), sqrt(1/n)) used by every other table
  (model_no_ddp.py:70-73).
- md_solver: the reference returns dims ordered by *sorted* table size but the
  caller applies them positionally to the unsorted tables
  (main_no_ddp.py:612-618 + md_embedding_bag.py:36). We return dims aligned to
  the input order (the paper's intent: dim is a function of the table's own
  row count).
- NOTE these tricks are unusable with the reference's cached path: its
  prefetcher reads ``E.weight`` which QREmbeddingBag/PrEmbeddingBag don't have
  (model_no_ddp.py:80-87 would raise). We support them on the full-table path.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QRParams:
    weight_q: jax.Array
    weight_r: jax.Array
    num_collisions: int = dataclasses.field(metadata=dict(static=True))
    operation: str = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MDParams:
    weight: jax.Array  # [n, d_small]
    proj: Union[jax.Array, None]  # [d_small, base_dim] or None when d == base


def init_qr_embedding(
    rng: np.random.Generator, n: int, d: int, num_collisions: int, operation: str = "mult"
) -> QRParams:
    assert operation in ("concat", "mult", "add")
    nq = int(np.ceil(n / num_collisions))
    bound = np.sqrt(1.0 / n)
    wq = rng.uniform(-bound, bound, size=(nq, d)).astype(np.float32)
    wr = rng.uniform(-bound, bound, size=(num_collisions, d)).astype(np.float32)
    return QRParams(jnp.asarray(wq), jnp.asarray(wr), int(num_collisions), operation)


def qr_lookup(p: QRParams, idx: jax.Array) -> jax.Array:
    q = idx // p.num_collisions
    r = idx % p.num_collisions
    eq = jnp.take(p.weight_q, q, axis=0)
    er = jnp.take(p.weight_r, r, axis=0)
    if p.operation == "concat":
        return jnp.concatenate([eq, er], axis=-1)
    if p.operation == "add":
        return eq + er
    return eq * er


def _xavier_uniform(rng: np.random.Generator, shape) -> np.ndarray:
    fan_in, fan_out = shape[0], shape[1]
    a = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-a, a, size=shape).astype(np.float32)


def init_md_embedding(rng: np.random.Generator, n: int, d: int, base_dim: int) -> MDParams:
    if d > base_dim:
        raise ValueError(f"md embedding dim {d} > base dim {base_dim}")
    # Reference PrEmbeddingBag uses xavier-uniform for the table but the
    # caller overwrites it with uniform(-sqrt(1/n), sqrt(1/n))
    # (model_no_ddp.py:60-64); we use the caller's (effective) init.
    bound = np.sqrt(1.0 / n)
    w = rng.uniform(-bound, bound, size=(int(n), int(d))).astype(np.float32)
    proj = None if d == base_dim else jnp.asarray(_xavier_uniform(rng, (int(d), int(base_dim))))
    return MDParams(jnp.asarray(w), proj)


def md_lookup(p: MDParams, idx: jax.Array) -> jax.Array:
    rows = jnp.take(p.weight, idx, axis=0)
    if p.proj is not None:
        rows = jnp.dot(rows, p.proj, preferred_element_type=jnp.float32)
    return rows


def md_solver(
    n: Sequence[int],
    alpha: float,
    d0: float = None,
    budget: float = None,
    round_dim: bool = True,
    k: Sequence[float] = None,
) -> np.ndarray:
    """Mixed-dimension assignment with the alpha-power temperature heuristic
    (reference md_embedding_bag.py:20-57). Returns int dims aligned to the
    input order of ``n``."""
    n = np.asarray(n, dtype=np.float64)
    k = np.ones_like(n) if k is None else np.asarray(k, dtype=np.float64)
    order = np.argsort(n)
    ns = (n / k)[order]
    if d0 is not None:
        lamb = d0 * (ns[0] ** alpha)
    elif budget is not None:
        lamb = budget / np.sum(ns ** (1 - alpha))
    else:
        raise ValueError("must specify either d0 or budget")
    d = lamb * (ns ** (-alpha))
    if d0 is not None:
        d[0] = d0
    d = np.maximum(np.round(d), 1.0)
    if round_dim:
        d = 2.0 ** np.round(np.log2(d))
    out = np.empty_like(d)
    out[order] = d
    return out.astype(np.int64)
