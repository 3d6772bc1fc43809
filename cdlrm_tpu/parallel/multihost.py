"""Multi-host scaffolding (SURVEY.md §7 step 6 — the north-star extension).

The reference is single-node by construction (MASTER_ADDR='localhost',
/root/reference/main_no_ddp.py:341); scaling cDLRM across hosts replaces its
"one shared host copy of the master tables" with row-sharded masters and a
cross-host exchange of cached rows. This module provides the runtime entry
points that exist today; the exchange itself is tracked as round-2+ work
(PARITY.md "Known gaps").

Design (documented for implementation):
- jax.distributed.initialize() per host; global 1-D dp mesh over all chips.
- Master tables row-sharded by contiguous range per host
  (ShardedMasterRange below): host h owns rows [h*n/H, (h+1)*n/H) of each
  table. The lookahead window's unique indices are partitioned by owner;
  each host gathers its owned rows.
- The refill insert buffer becomes a device-side all_gather over the dp
  axis of fixed-size padded (slot, row) buffers — each host contributes the
  rows it owns, every replica applies the union. Eviction writeback routes
  rows back to their owner the same way (reverse direction), tolerating the
  same staleness window as the single-host design.
- The step function is unchanged: probe stays host-local because occupancy
  updates are deterministic and identical on every host (same windows, same
  seeds) — each host maintains a full occupancy MIRROR while owning only a
  row range of the master VALUES.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX (no-op when single-process). Returns
    (process_index, process_count)."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


@dataclass(frozen=True)
class ShardedMasterRange:
    """Row-range ownership of the master tables for one host."""

    host_id: int
    num_hosts: int

    def owned_range(self, n_rows: int) -> Tuple[int, int]:
        per = -(-n_rows // self.num_hosts)
        lo = min(self.host_id * per, n_rows)
        hi = min(lo + per, n_rows)
        return lo, hi

    def owner_of(self, idx: np.ndarray, n_rows: int) -> np.ndarray:
        per = -(-n_rows // self.num_hosts)
        return np.minimum(idx // per, self.num_hosts - 1)

    def partition_by_owner(self, idx: np.ndarray, n_rows: int):
        """Split a sorted unique index array into per-owner slices."""
        owners = self.owner_of(idx, n_rows)
        bounds = np.searchsorted(owners, np.arange(self.num_hosts + 1))
        return [idx[bounds[h] : bounds[h + 1]] for h in range(self.num_hosts)]
