"""Host master embedding tables.

TPU-native equivalent of the reference's shared-memory CPU table group
(``Embedding_Table_Group`` + ``.share_memory()``,
/root/reference/model_no_ddp.py:21-98, main_no_ddp.py:621-622): full-size
per-table float32 arrays in host RAM (optionally mmap-backed for
larger-than-RAM tables), **frozen** — never trained directly
(model_no_ddp.py:74); the only mutation is eviction writeback
(cache_manager.py:48-64). Rows that are never cached are never trained —
a semantic feature of cDLRM we preserve (SURVEY.md §7 quirk list).

Concurrency: the prefetcher gathers rows while the eviction thread writes
others back. The reference tolerates this unsynchronized (shared-memory
tensors, no locks); races only affect staleness of individual rows, which the
algorithm already tolerates. We keep the same model and document it.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from cdlrm_tpu.ops import native


class MasterTables:
    def __init__(
        self,
        ln_emb: Sequence[int],
        dim: int,
        rng: Optional[np.random.Generator] = None,
        mmap_dir: Optional[str] = None,
        init: str = "uniform",
    ):
        """init: 'uniform' = exact per-row uniform(-sqrt(1/n), sqrt(1/n))
        (reference init); 'tile' = one random block tiled across each table —
        O(block) RNG instead of O(rows), for benchmarking and for hosts where
        RNG throughput is the bottleneck (values still uniform in the right
        range; rows repeat with period 65536)."""
        self.ln_emb = [int(n) for n in ln_emb]
        self.dim = int(dim)
        self.tables: List[np.ndarray] = []
        rng = rng or np.random.default_rng(0)

        block = None
        if init == "tile":
            fast = np.random.Generator(np.random.SFC64(int(rng.integers(2**31))))
            block = fast.random((65536, self.dim), dtype=np.float32) * 2.0 - 1.0

        for t, n in enumerate(self.ln_emb):
            bound = np.float32(np.sqrt(1.0 / n))

            def fill(out, rows, offset=0):
                if block is not None:
                    bs = block.shape[0]
                    for s in range(0, rows, bs):
                        e = min(rows, s + bs)
                        np.multiply(block[: e - s], bound, out=out[s:e])
                    return
                # float32-native uniform(-bound, bound): avoids a float64
                # intermediate (2x memory + time on multi-GB tables)
                r = rng.random((rows, self.dim), dtype=np.float32)
                np.multiply(r, 2 * bound, out=r)
                np.subtract(r, bound, out=r)
                out[...] = r

            if mmap_dir is not None:
                path = os.path.join(mmap_dir, f"master_table_{t}.npy")
                arr = np.lib.format.open_memmap(
                    path, mode="w+", dtype=np.float32, shape=(n, self.dim)
                )
                chunk = max(1, (1 << 24) // max(1, self.dim))
                for s in range(0, n, chunk):
                    e = min(n, s + chunk)
                    fill(arr[s:e], e - s)
            else:
                arr = np.empty((n, self.dim), dtype=np.float32)
                fill(arr, n)
            self.tables.append(arr)

    def gather(self, t: int, idxs: np.ndarray) -> np.ndarray:
        """Row gather (reference fetch_unique_idx_slices,
        model_no_ddp.py:80-87). Row-parallel native path when available
        (numpy fancy indexing is single-threaded)."""
        tab = self.tables[t]
        if native.available() and tab.flags["C_CONTIGUOUS"]:
            return native.gather_f32(tab, np.asarray(idxs))
        return np.asarray(tab[idxs], dtype=np.float32)

    def gather_all(self, idxs_per_table: Sequence[np.ndarray]) -> List[np.ndarray]:
        return [self.gather(t, idxs) for t, idxs in enumerate(idxs_per_table)]

    def writeback(
        self, t: int, idxs: np.ndarray, rows: np.ndarray, average: bool = False
    ) -> int:
        """Eviction writeback: overwrite or average with the resident rows
        (reference cache_manager.py:58-62). Returns rows actually written."""
        if idxs.size == 0:
            return 0
        tab = self.tables[t]
        if native.available() and tab.flags["C_CONTIGUOUS"]:
            native.writeback_f32(tab, np.asarray(idxs), rows, average)
        elif average:
            tab[idxs] = (tab[idxs] + rows) / 2.0
        else:
            tab[idxs] = rows
        return int(idxs.size)

    # ---- checkpointing (capability upgrade; reference has none) ----
    def save(self, path: str) -> None:
        np.savez(path, **{f"table_{t}": arr for t, arr in enumerate(self.tables)})

    def load(self, path: str) -> None:
        with np.load(path) as data:
            for t in range(len(self.tables)):
                self.tables[t][...] = data[f"table_{t}"]


class VirtualMasterTables:
    """Procedurally-generated master tables with a sparse writeback overlay.

    Same interface as MasterTables, but rows are computed on demand from a
    small random block instead of materialized: gather(t, idx) returns
    block[(idx + t*PHI) % block_rows] * bound_t, with written-back rows kept
    in a per-table sorted overlay. Exists for benchmarking on hosts where
    materializing / first-touching many GB of table memory costs minutes
    (e.g. throttled VMs); the gather/writeback cost profile matches the real
    MasterTables. Not for real training: rows repeat with period block_rows.
    """

    _PHI = 0x9E3779B1

    def __init__(self, ln_emb, dim, rng=None, block_rows: int = 65536):
        self.ln_emb = [int(n) for n in ln_emb]
        self.dim = int(dim)
        rng = rng or np.random.default_rng(0)
        fast = np.random.Generator(np.random.SFC64(int(rng.integers(2**31))))
        self._block = fast.random((block_rows, self.dim), dtype=np.float32) * 2.0 - 1.0
        self._bounds = [np.float32(np.sqrt(1.0 / n)) for n in self.ln_emb]
        # (idx, rows) pairs swapped ATOMICALLY (one reference assignment):
        # the eviction thread rebuilds the overlay while the prefetcher
        # gathers — two separate attributes raced (mismatched sizes crash)
        self._overlay = [
            (np.zeros(0, np.int64), np.zeros((0, self.dim), np.float32))
            for _ in self.ln_emb
        ]

    def gather(self, t: int, idxs: np.ndarray) -> np.ndarray:
        idxs = np.asarray(idxs, dtype=np.int64)
        pos = (idxs + t * self._PHI) % self._block.shape[0]
        rows = self._block[pos] * self._bounds[t]
        o_idx, o_rows = self._overlay[t]  # consistent snapshot
        if o_idx.size:
            loc = np.searchsorted(o_idx, idxs)
            loc_c = np.minimum(loc, o_idx.size - 1)
            hit = o_idx[loc_c] == idxs
            if hit.any():
                rows[hit] = o_rows[loc_c[hit]]
        return rows

    def gather_all(self, idxs_per_table):
        return [self.gather(t, i) for t, i in enumerate(idxs_per_table)]

    def writeback(self, t: int, idxs: np.ndarray, rows: np.ndarray, average: bool = False) -> int:
        if idxs.size == 0:
            return 0
        idxs = np.asarray(idxs, dtype=np.int64)
        rows = np.asarray(rows, dtype=np.float32)
        if average:
            rows = (self.gather(t, idxs) + rows) / 2.0
        o_idx, o_rows = self._overlay[t]
        merged_idx = np.concatenate([o_idx, idxs])
        merged_rows = np.concatenate([o_rows, rows])
        # keep the LAST write per index
        uniq, last_rev = np.unique(merged_idx[::-1], return_index=True)
        keep = merged_idx.size - 1 - last_rev
        self._overlay[t] = (uniq, merged_rows[keep])  # atomic swap
        return int(idxs.size)

    def save(self, path: str) -> None:
        np.savez(
            path,
            block=self._block,
            **{f"oidx_{t}": self._overlay[t][0] for t in range(len(self.ln_emb))},
            **{f"orows_{t}": self._overlay[t][1] for t in range(len(self.ln_emb))},
        )

    def load(self, path: str) -> None:
        with np.load(path) as data:
            self._block = data["block"]
            for t in range(len(self.ln_emb)):
                self._overlay[t] = (data[f"oidx_{t}"], data[f"orows_{t}"])
