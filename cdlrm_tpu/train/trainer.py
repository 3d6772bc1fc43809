"""Training orchestration: the single-controller equivalent of the
reference's launcher + per-rank trainer loop
(/root/reference/main_no_ddp.py:324-502,505-646).

One Python process drives the whole DP mesh:
  - the lookahead prefetcher + eviction manager run as host threads
    (cache/prefetcher.py);
  - every ``lookahead`` steps the next window is popped, the insert/evict
    plan computed against the host occupancy, and the jitted refill applied
    (reference load_caches_and_broadcast, main_no_ddp.py:309-321);
  - every step the batch is probed per DP shard, assembled into sharded
    device arrays, and the jitted train step runs;
  - every ``table_agg_freq`` steps the jitted touched-row aggregation runs
    (reference main_no_ddp.py:418-423);
  - rank-0-style windowed metrics (ms/it, caching overhead, loss, accuracy —
    main_no_ddp.py:458-475) plus first-class cache hit rate and eval AUC.

Host/device overlap: jax dispatch is async, so probing batch j+1 overlaps
with device compute of batch j; metrics tensors are only materialized at
print boundaries.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cdlrm_tpu.cache.geometry import CacheGeometry
from cdlrm_tpu.cache.host_cache import (
    HostCacheController, InsertPlan, build_insert_plan,
)
from cdlrm_tpu.cache.master import MasterTables
from cdlrm_tpu.cache.prefetcher import EvictionManager, LookaheadPrefetcher, WindowData
from cdlrm_tpu.config import Config
from cdlrm_tpu.data.synthetic import Batch
from cdlrm_tpu.models.dlrm import init_dlrm
from cdlrm_tpu.ops import native
from cdlrm_tpu.parallel.mesh import (
    DP_AXIS, local_batch_rows, local_replica_ids, local_shard, make_dp_mesh,
    put_global, put_global_many,
)
from cdlrm_tpu.parallel.multihost import (
    CollectingMaster, GlobalRowExchange, RowShard, ShardedMasterTables,
    WindowRowStore, exchange_window_rows,
)
from cdlrm_tpu.train import step as step_lib
from cdlrm_tpu.utils.metrics import StreamingAUC, accuracy_count
from cdlrm_tpu.utils.padding import pad_to_bucket, pow2_bucket


# checkpoint layout version written to meta.pkl; see save_checkpoint
CHECKPOINT_FORMAT_VERSION = 3


@dataclass
class TrainMetrics:
    steps: int = 0
    examples: int = 0
    loss_sum: float = 0.0
    correct: float = 0.0
    train_time_s: float = 0.0
    caching_overhead_s: float = 0.0
    refills: int = 0
    hits: int = 0
    lookups: int = 0
    # eval probes are counted separately: a test-heavy run must not skew the
    # train-window hit rate (the flagship first-class metric)
    eval_hits: int = 0
    eval_lookups: int = 0
    # per-table hit accounting: first-class metric the reference computes but
    # comments out (model_no_ddp.py:206-207)
    table_hits: Optional[np.ndarray] = None
    table_lookups: int = 0

    @property
    def hit_rate(self) -> float:
        return self.hits / max(1, self.lookups)

    @property
    def eval_hit_rate(self) -> float:
        return self.eval_hits / max(1, self.eval_lookups)

    @property
    def per_table_hit_rates(self) -> Optional[np.ndarray]:
        if self.table_hits is None or self.table_lookups == 0:
            return None
        return self.table_hits / self.table_lookups


class _ProbeStats:
    """Per-batch train probe counters, accumulated into TrainMetrics when the
    batch is CONSUMED by the train loop — not when the assembly pipeline
    probes it. The pipeline runs up to ``depth`` batches ahead, so counting
    at probe time makes reported totals depend on how far ahead it happened
    to be when training stopped (a thread-timing artifact, not a metric)."""

    __slots__ = ("hits", "lookups", "table_hits")

    def __init__(self, t_count: int):
        self.hits = 0
        self.lookups = 0
        self.table_hits = np.zeros(t_count, dtype=np.int64)

    def add(self, hit_counts: np.ndarray, num_lookups: int) -> None:
        self.hits += int(hit_counts.sum())
        self.lookups += num_lookups
        self.table_hits += hit_counts

    def commit(self, m: TrainMetrics) -> None:
        m.hits += self.hits
        m.lookups += self.lookups
        if m.table_hits is None:
            m.table_hits = np.zeros(self.table_hits.shape[0], dtype=np.int64)
        m.table_hits += self.table_hits
        m.table_lookups += self.lookups // self.table_hits.shape[0]


class _WindowStager(threading.Thread):
    """Depth-1 refill prestager (config.refill_prestage): pops ready windows
    from the LookaheadPrefetcher and, for shadow-planned windows, joins the
    insert plan (``build_insert_plan`` — a pure (plan_spec, rows) join) and
    STARTS the H2D of the padded insert/evict arrays while the previous
    window is still training. By the time the train thread reaches the
    boundary the refill's device inputs are already in flight or landed, so
    ``_apply_refill`` pays plan replay + dispatch instead of the synchronous
    transfer (on the paper config the insert rows are the window's dominant
    refill transfer; reference analog: the cache-manager process hiding its
    fills off the trainer's critical path, cache_manager.py).

    Exactness: the occupancy mutation (``apply_plan_spec``) stays on the
    train thread at the boundary, preserving the probe/insert serialization
    invariant (train/pipeline.py module doc); plan METADATA is shadow-planned
    and therefore bit-identical with or without staging. The one re-timed
    surface is inserted row VALUES: popping the window FIFO a step earlier
    shifts when the prefetcher's master gathers run relative to in-flight
    eviction writebacks — the same eventually-consistent envelope the
    reference's asynchronous cache manager has (cache_manager.py:48-64), and
    with no writebacks in flight the trajectory is bit-identical
    (tests/test_trainer_e2e.py::test_refill_prestage_matches_unstaged pins
    both statements). Windows without a plan_spec (mid-window resume
    replays, shadowless unit configs) pass through unstaged. Cost: up to one
    extra window's insert rows held in HBM while staged."""

    def __init__(self, trainer):
        super().__init__(daemon=True, name="window-stager")
        self.trainer = trainer
        self.out: "queue.Queue" = queue.Queue(maxsize=1)
        self.error: Optional[BaseException] = None
        self._stop_event = threading.Event()

    def run(self) -> None:
        try:
            while not self._stop_event.is_set():
                try:
                    window = self.trainer.prefetcher.get_window(timeout=0.1)
                except queue.Empty:
                    continue
                if window is None:
                    break
                # wait for the depth-1 slot BEFORE staging: the documented
                # HBM budget is ONE extra window's insert rows — staging
                # ahead of queue space would hold two
                while self.out.full() and not self._stop_event.is_set():
                    time.sleep(0.05)
                if self._stop_event.is_set():
                    return
                tr = self.trainer
                staged = None
                if window.plan_spec is not None:
                    plan = build_insert_plan(
                        window.plan_spec, window.rows, tr.geo.dim
                    )
                    # stage_acc=False: the resume-accumulator gather must
                    # run on the MAIN thread at the boundary — this thread
                    # races _apply_refill(w), whose eviction writebacks are
                    # enqueued at its END, so a fence here could flush an
                    # empty fifo and read a stale accumulator for an id
                    # evicted at w and reinserted at w+1
                    # (_complete_staged_acc finishes the operand there)
                    staged = (
                        plan, tr._refill_device_inputs(plan, stage_acc=False)
                    )
                while not self._stop_event.is_set():
                    try:
                        self.out.put((window, staged), timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:
            self.error = e
        finally:
            while not self._stop_event.is_set():
                try:
                    self.out.put(None, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def get(self) -> Optional[Tuple[WindowData, Optional[tuple]]]:
        """Pop (window, staged); None = stream exhausted (errors re-raised)."""
        item = self.out.get()
        if item is None and self.error is not None:
            raise self.error
        return item

    def stop(self) -> None:
        self._stop_event.set()
        try:
            while True:
                self.out.get_nowait()
        except queue.Empty:
            pass


class CachedDlrmTrainer:
    """End-to-end cached-DLRM trainer over a 1-D dp mesh."""

    def __init__(self, cfg: Config, dataset, test_dataset=None, mesh=None,
                 pooled_width: Optional[int] = None):
        """``dataset`` must expose: batches() -> Iterator[Batch] (restartable),
        __len__, and attrs m_den, ln_emb. ``test_dataset`` likewise.

        ``pooled_width``: P for padded multi-hot bags ([T, B, P] + mask
        batches); default infers from the config (Criteo and fixed
        single-index synthetic streams -> 0)."""
        assert cfg.ln_emb is not None, "call cfg.finalize() first"
        self.cfg = cfg
        self.dataset = dataset
        self.test_dataset = test_dataset
        self.mesh = mesh if mesh is not None else make_dp_mesh(cfg.world_size)
        self.ndev = self.mesh.devices.size
        assert self.ndev == cfg.world_size, (
            f"mesh has {self.ndev} devices, config world_size={cfg.world_size}"
        )
        # multi-host: this process feeds only its addressable replicas
        # (parallel/multihost.py module doc); replica ids are contiguous in
        # the process-major device order of jax.devices()
        self.multihost = jax.process_count() > 1
        self.local_ids = local_replica_ids(self.mesh)
        self.n_local = len(self.local_ids)
        if self.multihost:
            assert self.local_ids == list(
                range(self.local_ids[0], self.local_ids[0] + self.n_local)
            ), "mesh devices must be process-contiguous along dp"
            # owned-range writeback relies on evicted rows being broadcast
            # from replica 0 (train/step.py make_refill_step); without the
            # broadcast every host would write back its own divergent values.
            # Both strict and delta keep the evicted-row broadcast.
            if cfg.refill_broadcast in (False, "off"):
                raise ValueError(
                    "multi-host execution requires refill_broadcast="
                    "'strict' or 'delta' (evicted-row broadcast)"
                )
        if pooled_width is None:
            # data-driven inference: datasets are restartable by contract
            # (see class docstring), so peek the first batch — single-index
            # streams carry ls_mask=None, padded multi-hot carries [T, B, P]
            first = next(iter(dataset.batches()))
            pooled_width = 0 if first.ls_mask is None else first.ls_i.shape[2]
        self.pooled_width = pooled_width

        rng = np.random.default_rng(cfg.numpy_rand_seed)
        self.host_rng = rng

        b_loc = cfg.local_batch_size
        test_b_loc = -(-cfg.test_mini_batch_size // self.ndev)
        aux_cap = cfg.aux_capacity if cfg.aux_capacity > 0 else (
            max(b_loc, test_b_loc) * max(1, pooled_width)
        )
        self.geo = CacheGeometry.build(
            cfg.ln_emb, cfg.m_spa, cfg.cache_size, cfg.num_ways, aux_cap
        )
        if cfg.qr_flag:
            # QR + cache is genuinely pointless (QR tables are SMALL by
            # construction — ceil(n/c) and c rows); the reference's cached
            # path would crash here (model_no_ddp.py:80-87). Match intent
            # with a clear error instead of silently ignoring the flag.
            raise ValueError(
                "qr_flag with the cached path: QR-compressed tables are "
                "small by construction — train them full-resident with "
                "--no-use-cache (FullTableDlrmTrainer)"
            )
        if cfg.md_flag:
            # cached MD (beyond-parity; StepConfig.md_proj): compact
            # [n_t, d_t] masters + zero-padded [., m_spa] wire rows.
            # Multi-host: row-sharded compact masters (procedural block
            # init sliced to d_t columns — host-count-invariant values).
            if self.multihost or cfg.master_init == "virtual":
                # procedural compact shards; master_init='virtual' single-
                # host uses RowShard(0, 1) so its values bit-match any
                # multi-host topology (the cross-topology trajectory tests)
                self.master = ShardedMasterTables(
                    cfg.ln_emb, cfg.m_spa,
                    RowShard(jax.process_index(), jax.process_count()),
                    rng, dims=cfg.m_spa_per_table,
                )
            else:
                from cdlrm_tpu.cache.master import MDMasterTables

                self.master = MDMasterTables(
                    cfg.ln_emb, cfg.m_spa_per_table, cfg.m_spa, rng,
                    mmap_dir=cfg.master_mmap_dir or None,
                )
        elif self.multihost:
            # row-sharded masters with procedural (seeded, host-count-
            # independent) values; master_init is ignored by design
            self.master = ShardedMasterTables(
                cfg.ln_emb, cfg.m_spa,
                RowShard(jax.process_index(), jax.process_count()),
                rng,
            )
        elif cfg.master_init == "virtual":
            from cdlrm_tpu.cache.master import VirtualMasterTables

            self.master = VirtualMasterTables(cfg.ln_emb, cfg.m_spa, rng)
        else:
            self.master = MasterTables(
                cfg.ln_emb, cfg.m_spa, rng, init=cfg.master_init,
                mmap_dir=cfg.master_mmap_dir or None,
            )
        use_map = cfg.probe_impl == "map" or (
            cfg.probe_impl == "auto"
            and int(np.sum(cfg.ln_emb)) * 4 <= cfg.slot_map_max_bytes
        )
        self.controller = HostCacheController(
            self.geo, seed=cfg.numpy_rand_seed,
            ln_emb=cfg.ln_emb, slot_map=use_map,
        )

        # dense params (replicated with a leading device axis)
        params = init_dlrm(rng, cfg.ln_bot, cfg.ln_top)
        self._md_mask: Tuple[float, ...] = ()
        if cfg.md_flag:
            # per-table projections [T, D, D]: xavier [d_t, D] blocks
            # (reference PrEmbeddingBag Linear init) zero-padded below;
            # full-dim tables get FROZEN identity (md_train_mask 0.0) — the
            # reference attaches no projection there
            from cdlrm_tpu.models.tricks import _xavier_uniform

            D = cfg.m_spa
            proj = np.zeros((len(cfg.ln_emb), D, D), np.float32)
            mask = []
            for t, d_t in enumerate(cfg.m_spa_per_table):
                if d_t == D:
                    proj[t] = np.eye(D, dtype=np.float32)
                    mask.append(0.0)
                else:
                    proj[t, :d_t] = _xavier_uniform(rng, (int(d_t), D))
                    mask.append(1.0)
            params["md_proj"] = proj
            self._md_mask = tuple(mask)
        self.params = step_lib.replicate_for_mesh(params, self.mesh)

        # FLAT per-replica state: [ndev*R, D] sharded P('dp') — each device's
        # block is its full (divergent) cache copy; see train/step.py module
        # doc for why the flat layout matters (donation aliasing)
        shard_lead = NamedSharding(self.mesh, P(DP_AXIS))
        R = self.geo.total_rows
        self.cache = put_global(
            np.zeros((self.n_local * R, self.geo.dim), np.float32),
            shard_lead,
            (self.ndev * R, self.geo.dim),
        )
        self.touched = put_global(
            np.zeros(self.n_local * R, bool),
            shard_lead,
            (self.ndev * R,),
        )
        # optimizer state (config.py optimizer doc): cache-resident row-wise
        # AdaGrad accumulators ([ndev*R] f32 like touched) + a dense-acc
        # pytree replicated like params. SGD carries none.
        self._ckpt_thread = None  # async checkpoint writer (save_checkpoint)
        self._ckpt_error = None
        self._adagrad = cfg.optimizer == "adagrad"
        if self._adagrad:
            self.embed_acc = put_global(
                np.zeros(self.n_local * R, np.float32),
                shard_lead,
                (self.ndev * R,),
            )
            self.dense_acc = step_lib.replicate_for_mesh(
                jax.tree_util.tree_map(
                    lambda v: np.zeros(v.shape[1:], np.float32), self.params
                ),
                self.mesh,
            )
        else:
            self.embed_acc = self.dense_acc = None
        # Config.adagrad_master_state: host-resident accumulator store —
        # evicted ids' row-wise state writes back with their rows; inserted
        # ids resume it (cache/master.py AccumulatorStore doc)
        self._acc_master = None
        # multihost: the assembled full-window accumulator values, set at
        # each window exchange (_exchange_window) and joined at insert
        # staging (_refill_device_inputs) — the sharded store itself only
        # ever serves the host's OWNED rows
        self._mh_window_accs = None
        if self._adagrad and cfg.adagrad_master_state:
            from cdlrm_tpu.cache.master import AccumulatorStore

            # multihost: row-sharded with the masters (compact owned
            # slices; writebacks mask to owned, resume values for un-owned
            # rows ride the window exchange — cache/master.py doc)
            self._acc_master = AccumulatorStore(
                cfg.ln_emb,
                owned_ranges=self.master.ranges if self.multihost else None,
            )

        # wire packing: bit-packed local slot ids at the smallest width that
        # addresses every table's cache block (train/step.py pack_slots)
        rows_per_table = self.geo.ways * self.geo.sets + self.geo.aux_capacity
        self._wire_bits = step_lib.wire_width(int(rows_per_table.max()) - 1)
        self._wire_pack = bool(
            cfg.pack_wire and self._wire_bits <= step_lib.WIRE_MAX_BITS
        )
        # Pallas gather needs TPU + lane-aligned dim + block-divisible
        # lookup count (ops/lookup.py layout contract)
        def _blk_ok(n):
            # ops/lookup.py: block = min(1024, n) must divide n, and blocks
            # must be sublane-aligned — accept n % 1024 == 0, or small n
            # that is itself a multiple of 256
            return n % 1024 == 0 or (n < 1024 and n % 256 == 0)

        n_train = len(cfg.ln_emb) * b_loc * max(1, pooled_width)
        n_eval = len(cfg.ln_emb) * test_b_loc * max(1, pooled_width)
        # dedup wire: rank stream at the width of per-table lookups + the
        # unique list at the slot wire width (both need <= WIRE_MAX_BITS).
        # 'auto' (the default) decides PER WINDOW from the shadow stats
        # pass: dedup wins in proportion to duplication (break-even ~U=0.5N)
        # and is the guard against the duplicate-heavy scatter cliff
        # (PERF.md findings 8-9) — _apply_window_stats flips the wire at
        # window boundaries, where probe format and compiled step always
        # switch together.
        dmode = cfg.dedup_lookups
        if dmode is True:
            dmode = "on"
        elif dmode in (False, None):
            dmode = "off"
        # unpacked wires (pack_wire=False, the fast-host-link mode) have no
        # bit-width ceiling; the packed dedup wire needs <= WIRE_MAX_BITS
        capable = (
            not self._wire_pack
            or self._wire_bits <= step_lib.WIRE_MAX_BITS
        )
        self._dedup_auto = dmode == "auto" and capable
        self._dedup = dmode == "on" and capable
        n_per_table = b_loc * max(1, pooled_width)
        self._inv_bits = step_lib.wire_width(n_per_table - 1)
        pallas_base = (
            cfg.use_pallas_lookup
            and jax.default_backend() == "tpu"
            and cfg.m_spa % 128 == 0
        )
        pallas_ok = (
            pallas_base
            # dedup's [Ub] gather breaks the block contract; auto mode may
            # switch into dedup at any window boundary, so Pallas needs the
            # wire pinned plain
            and dmode == "off"
            and _blk_ok(n_train)
            and _blk_ok(n_eval)
        )
        # the EVAL wire is always plain regardless of the train dedup mode,
        # so the forward-only (serving) gather can ride Pallas whenever its
        # own shape qualifies
        pallas_eval_ok = pallas_base and _blk_ok(n_eval)
        # single replica: aggregation is the identity (psum over one device),
        # so the agg step AND the per-step touched scatters are skipped
        self._needs_agg = self.ndev > 1
        scfg = step_lib.StepConfig(
            interaction_op=cfg.arch_interaction_op,
            interaction_itself=cfg.arch_interaction_itself,
            loss_function=cfg.loss_function,
            loss_weights=tuple(cfg.loss_weights_list),
            loss_threshold=cfg.loss_threshold,
            table_agg_op=cfg.table_agg_op,
            strict_bias_divergence=cfg.strict_bias_divergence,
            # single replica: every refill collective is the identity — drop
            # them from the compiled step regardless of the requested mode
            refill_broadcast=("off" if self.ndev == 1 else cfg.refill_broadcast),
            compute_dtype=cfg.compute_dtype,
            wire_pack=self._wire_pack,
            wire_bits=self._wire_bits,
            use_pallas_lookup=pallas_ok,
            # DMA row scatters (ops/scatter.py): on the plain/eval bodies
            # this covers only the aux staging set (grad scatters there
            # have duplicate slots); the dedup body also converts the
            # unique-row scatter-add. Static per-op block-shape fallback
            # in the step (_pallas_blk_ok).
            use_pallas_scatter=bool(
                cfg.use_pallas_scatter
                and (jax.default_backend() == "tpu"
                     or cfg.pallas_interpret)
                and cfg.m_spa % 128 == 0
            ),
            pallas_interpret=cfg.pallas_interpret,
            wire_rows_bf16=cfg.wire_rows_bf16,
            track_touched=self._needs_agg,
            dedup=False,
            inv_bits=self._inv_bits,
            uniq_bits=self._wire_bits,
            md_proj=bool(cfg.md_flag),
            md_train_mask=self._md_mask,
            optimizer=cfg.optimizer,
            adagrad_eps=cfg.adagrad_eps,
            adagrad_master_state=bool(cfg.adagrad_master_state),
        )
        self._row_wire_dtype = (
            jnp.bfloat16 if cfg.wire_rows_bf16 else np.float32
        )
        # two step-config variants share everything but the wire format; the
        # compiled-step cache (_get_step) is keyed on (block, dedup) so auto
        # mode can switch per window without recompiling earlier variants
        self.step_cfg = scfg
        self.step_cfg_dedup = scfg._replace(
            dedup=True, use_pallas_lookup=False,
            sorted_wire=bool(cfg.sorted_dedup_wire and not self._wire_pack),
        )
        # scan blocks: one dispatch per `scan_steps` train steps (dispatch
        # amortization; config.py). With dedup, per-window negotiated unique
        # buckets keep the wire shapes block-stable (_apply_window_stats).
        self._scan_block = max(1, cfg.scan_steps)
        # block-coalesced sparse update (config.py block_coalesced_update):
        # dedup-wire scan blocks route per-lookup grads into a pending
        # buffer and flush the cache once per block (StepConfig doc)
        self._block_coalesce = bool(cfg.block_coalesced_update)
        self._step_cache: dict = {}  # (block size, dedup) -> compiled step
        self.eval_step = step_lib.make_cached_eval_step(
            self.mesh, self.geo,
            scfg._replace(use_pallas_lookup=pallas_eval_ok),
            self.pooled_width,
        )
        self.refill_step = step_lib.make_refill_step(
            self.mesh, scfg, trash_row=self.geo.trash_row
        )
        # sparse union exchange: per-step distinct touched slots <= global
        # lookups per step, so the union since the last aggregation is bounded
        # EXACTLY by freq * B_glob * T * P — no overflow branch needed. Near
        # R the dense masked allreduce moves fewer bytes; cross over at R/2.
        union_bound = (
            cfg.table_agg_freq
            * cfg.mini_batch_size
            * len(cfg.ln_emb)
            * max(1, pooled_width)
        )
        if cfg.table_agg_bucket > 0 and self._needs_agg:
            if cfg.table_agg_bucket < min(union_bound, R):
                # the sparse union exchange SILENTLY truncates past its
                # bucket (jnp.nonzero(size=...)); an undersized user bucket
                # would drop touched rows from aggregation — fail fast
                raise ValueError(
                    f"--table-agg-bucket {cfg.table_agg_bucket} is below the "
                    f"exact touched-union bound {min(union_bound, R)} "
                    f"(table_agg_freq * batch * tables * pooled width, capped "
                    "at cache rows); aggregation would silently drop rows"
                )
            bucket = cfg.table_agg_bucket
        else:
            bucket = pow2_bucket(min(union_bound, R))
        self.agg_step = step_lib.make_aggregate_step(
            self.mesh, scfg,
            union_bucket=bucket if bucket <= R // 2 else None,
            trash_row=self.geo.trash_row,
        )

        self._shardings = {
            "lead": shard_lead,
            "batch0": NamedSharding(self.mesh, P(DP_AXIS)),
            "slots": NamedSharding(self.mesh, P(None, DP_AXIS)),
            "rep": NamedSharding(self.mesh, P()),
        }

        # host pipeline
        self.eviction_fifo: "queue.Queue" = queue.Queue(maxsize=cfg.eviction_fifo_size)
        # core-pin layout (cfg.main_start_core doc; reference
        # main_no_ddp.py:634-635, cache_manager.py:71,79): main +0,
        # prefetcher +1, eviction +2, worker p at +3+p. Pin the main thread
        # BEFORE spawning pipeline threads — children inherit affinity, and
        # every pinned thread re-pins itself to its own core on start.
        if cfg.pin_cores:
            from cdlrm_tpu.utils.affinity import pin_current_thread

            pin_current_thread(cfg.main_start_core)
        self.eviction_manager = EvictionManager(
            self.master,
            self.eviction_fifo,
            average_on_writeback=cfg.average_on_writeback,
            timeout=cfg.eviction_fifo_timeout,
            pin_core=cfg.main_start_core + 2 if cfg.pin_cores else None,
            acc_store=self._acc_master,
        )
        # built in _start_pipeline: its stream cursor depends on a possible
        # load_checkpoint between construction and the first train() call
        self.prefetcher: Optional[LookaheadPrefetcher] = None
        # multi-host state: exchanged-window miss store + eval row exchange.
        # The packed-miss bucket is part of the compiled GLOBAL array shape,
        # so it must be host-count-invariant. TRAIN batches get a per-window
        # NEGOTIATED bucket (zero communication: occupancy metadata and the
        # index stream are host-identical, so every host computes the same
        # exact post-refill miss counts — _window_buckets); --aux-bucket
        # caps it. EVAL misses are not window-bounded, so eval keeps the
        # worst case (every lookup misses).
        self._window_store: Optional[WindowRowStore] = None
        self._aux_bucket = (
            cfg.aux_bucket if cfg.aux_bucket > 0
            else len(cfg.ln_emb) * self.geo.aux_capacity
        )
        self._aux_bucket_window: Optional[int] = None  # negotiated per window
        # negotiated per-eval-batch miss bucket (multihost; see _assemble).
        # The log is BOUNDED (observability only — a long serving run must
        # not grow host memory linearly with eval batches).
        self._eval_bucket_batch: Optional[int] = None
        from collections import deque

        self._eval_bucket_log: "deque" = deque(maxlen=1024)
        # single-host monotone staging buckets (see _pack_aux)
        self._bucket_run_max = {"train": 0, "eval": 0, "dedup": 0, "blk": 0}
        # block-coalesce host-pass scratch (built lazily on first block):
        # static real-row mask + per-replica slot->rank maps
        # (_build_block_union)
        self._blk_real_mask = None
        self._blk_real_bits = None
        self._blk_rank_map = None
        self._row_exchange = (
            GlobalRowExchange(
                self.master,
                # capacity must be HOST-COUNT-SYMMETRIC (it is the fixed
                # allgather payload shape): bound by the global device count,
                # not this host's local count
                capacity=(
                    len(cfg.ln_emb) * test_b_loc * max(1, pooled_width)
                    * self.ndev
                ),
            )
            if self.multihost
            else None
        )

        # wire probes emit the bit-packed device format directly (fused
        # probe+pack in csrc/host_ops.cpp)
        self._probe_fn = (
            functools.partial(self.controller.probe_wire, bits=self._wire_bits)
            if self._wire_pack else self.controller.probe
        )
        # dedup: worst-case unique bucket (the bucket is a compiled global
        # shape); multihost/scan runs replace it with the per-window
        # negotiated value (_window_buckets), derived identically on
        # every host from shared metadata
        self._dedup_bucket = pow2_bucket(
            1 + len(cfg.ln_emb) * b_loc * max(1, pooled_width), min_size=1024
        )
        self._dedup_bucket_window: Optional[int] = None
        # hot-tier update (config.hot_tier_rows): per-window hot list +
        # exactly-negotiated cold compaction bucket, both from the shadow
        # stats pass. H is clamped to at least 8 (1 reserved trash position)
        self._hot = max(8, cfg.hot_tier_rows) if cfg.hot_tier_rows > 0 else 0
        self._hot_slots_dev = None
        self._cold_bucket_window: Optional[int] = None
        # shadow window stats (cache/prefetcher.py): needed whenever staging
        # buckets must be negotiated per window — multihost (host-symmetric
        # compiled shapes) or scan blocks (batches stacked in one block
        # share shapes) — or when auto-dedup/hot-tier need window signals
        self._need_stats = (
            self.multihost or self._scan_block > 1 or self._dedup_auto
            or self._hot > 0
        )
        self._dummy_masks: dict = {}  # (T, N_local) -> cached device constant
        self._pipeline_started = False
        self._pipe = None
        self._stager = None
        self._stream_done = False
        self.global_step = 0
        # data cursor: (epoch, next batch index within it) — saved in
        # checkpoints so a resumed run continues the SAME stream alignment
        # (windows, refills) instead of restarting it (SURVEY §7 step 8)
        self._cursor: Tuple[int, int] = (0, 0)
        self.metrics = TrainMetrics()
        self._lr = jnp.float32(cfg.learning_rate)
        self._lr_emb = jnp.float32(cfg.lr_embeds)
        self._stop_requested = False
        self.last_window: Optional[dict] = None  # most recent print-window stats
        # structured metrics log (config.metrics_log): JSON lines, host 0
        # only — window metrics are psum'd replica-identical scalars
        self._metrics_fp = None
        if cfg.metrics_log and jax.process_index() == 0:
            log_dir = os.path.dirname(cfg.metrics_log)
            if log_dir:
                os.makedirs(log_dir, exist_ok=True)
            self._metrics_fp = open(cfg.metrics_log, "a")

    def _log_metrics(self, kind: str, payload: dict) -> None:
        if self._metrics_fp is None:
            return
        rec = {"kind": kind, "step": self.global_step, **payload}
        self._metrics_fp.write(json.dumps(rec) + "\n")
        self._metrics_fp.flush()

    # ------------------------------------------------------------------ data
    def _cache_stream(self, skip: int = 0,
                      epoch: int = 0) -> Iterator[np.ndarray]:
        """The prefetcher's view of the index stream (reference cache_ld,
        dlrm_data_pytorch.py:465-483): a second pass over the same batches,
        dropping the final partial batch exactly as the trainer does.
        ``skip`` resumes mid-stream (checkpoint data cursor).

        Datasets exposing ``index_batches`` (the Criteo loaders) serve this
        pass INDEX-ONLY: only the sparse columns are decoded — for the
        streaming loader only the X_cat npz member is decompressed, ~2/3
        less zlib work than re-reading full batches (round-3 verdict
        item 6; equivalence pinned in tests/test_data_criteo.py)."""
        b = self.cfg.mini_batch_size
        idx_fn = getattr(self.dataset, "index_batches", None)
        if idx_fn is not None:
            kw = (
                {"epoch": epoch}
                if getattr(self.dataset, "epoch_seeded_shuffle", False)
                else {}
            )
            for ls_i in idx_fn(skip=skip, **kw):
                if ls_i.shape[1] != b:
                    continue  # identical drop-last rule as the main loop
                yield ls_i
            return
        from cdlrm_tpu.train.pipeline import _batches_from

        for batch in _batches_from(self.dataset, skip, full_size=b,
                                   epoch=epoch):
            if batch.x.shape[0] != b:
                continue
            if batch.ls_mask is not None:
                yield (batch.ls_i, batch.ls_mask)
            else:
                yield batch.ls_i

    # ------------------------------------------------------------------ refill
    def _refill_device_inputs(self, plan: InsertPlan, stage_acc: bool = True):
        """The refill step's padded device operands for an insert plan —
        the ONE place the pad/astype/H2D triple lives (both the boundary
        path and the _WindowStager stage from here, so staged and unstaged
        refills cannot drift). With adagrad_master_state the inserted ids'
        accumulator values ride as a fourth operand; ``stage_acc=False``
        (the _WindowStager thread, which runs concurrently with the
        PREVIOUS boundary's _apply_refill and so can fence before its
        evictions are even enqueued) defers that gather to the main
        thread at the boundary — _complete_staged_acc — where the fence
        is meaningful."""
        ops = (
            jnp.asarray(pad_to_bucket(plan.insert_slots, self.geo.trash_row)),
            jnp.asarray(pad_to_bucket(plan.insert_rows, 0.0).astype(
                self._row_wire_dtype, copy=False)),
            jnp.asarray(pad_to_bucket(plan.evict_slots, 0)),
        )
        if self._acc_master is not None and stage_acc:
            if self.multihost:
                # un-owned resume values arrived on the window exchange
                # (one extra f32 column on the row allgather); the fence
                # ran host-locally before each host contributed its owned
                # slice (_exchange_window)
                acc = self._join_window_accs(
                    plan.insert_tables, plan.insert_ids
                )
            else:
                # exactness fence: the resume values must include every
                # accumulator writeback enqueued by EARLIER boundaries —
                # the eviction thread applies them asynchronously, and an
                # id evicted at boundary w can be reinserted at w+1
                # (exactly the thrash regime the flag targets). Row VALUES
                # deliberately keep the reference's eventually-consistent
                # envelope, but the accumulator is a STATE restore whose
                # exactness is the feature's contract
                # (tests/test_adagrad_master_state.py); without the fence
                # a racing gather silently reads the stale (often 0.0 =
                # drop-at-evict) value. The fifo is normally drained long
                # before the next boundary, so the steady cost is one
                # empty-queue barrier round-trip; when evictions ARE in
                # flight (back-to-back refills, prestage hoist) we wait —
                # the price of the contract. The fence also quiesces the
                # writer, so the unlocked numpy gather below reads stable
                # arrays.
                if self.eviction_manager is not None:
                    self.eviction_manager.flush()
                acc = self._acc_master.gather(
                    plan.insert_tables, plan.insert_ids
                )
            ops += (jnp.asarray(pad_to_bucket(acc, 0.0)),)
        return ops

    def _exchange_window(self, window_uniques, owned_rows):
        """Multihost window-row exchange; with adagrad_master_state each
        host's OWNED accumulator slices ride the same allgather as one
        extra f32 column (parallel/multihost.py exchange_window_rows),
        after the host-local eviction fence — the multihost form of the
        single-host exactness fence in _refill_device_inputs. The
        assembled full-window accs are kept for the insert-staging join
        (_join_window_accs)."""
        if self._acc_master is None:
            return exchange_window_rows(
                self.master, window_uniques, owned_rows
            )
        if self.eviction_manager is not None:
            self.eviction_manager.flush()
        owned_accs = [
            self._acc_master.gather_owned_slice(t, window_uniques[t])
            for t in range(len(window_uniques))
        ]
        rows, accs = exchange_window_rows(
            self.master, window_uniques, owned_rows, owned_accs
        )
        # WindowRowStore's sorted join + membership guard works on the 1-D
        # accs exactly as on the 2-D rows — one implementation of the
        # searchsorted validation, not two
        self._mh_window_accs = WindowRowStore(window_uniques, accs)
        return rows

    def _join_window_accs(self, tables: np.ndarray, ids: np.ndarray):
        """Resume accumulators for an insert list, joined from the current
        window's exchanged accs (inserted ids are window uniques by
        construction — plan_insert selects from them)."""
        out = np.empty(ids.size, np.float32)
        for t in np.unique(tables):
            sel = tables == t
            out[sel] = self._mh_window_accs.gather(int(t), ids[sel])
        return out

    def _complete_staged_acc(self, plan: InsertPlan, d_inputs):
        """Finish a _WindowStager-staged operand tuple on the MAIN thread:
        gather the resume accumulators behind the eviction fence and append
        the fourth operand (see _refill_device_inputs stage_acc doc — the
        stager thread races the previous boundary's eviction enqueue, so
        only a boundary-time fence guarantees the writebacks it must wait
        for are even visible). No-op without adagrad_master_state or when
        the operand already rides (multihost hoist stages on the main
        thread post-exchange)."""
        if self._acc_master is None or len(d_inputs) == 4:
            return d_inputs
        if self.eviction_manager is not None:
            self.eviction_manager.flush()
        acc = self._acc_master.gather(plan.insert_tables, plan.insert_ids)
        return tuple(d_inputs) + (jnp.asarray(pad_to_bucket(acc, 0.0)),)

    def _prefetch_next_window(self) -> None:
        """Multi-host refill prestage (config.refill_prestage): run the NEXT
        boundary's host half one window early — pop window w+1 from the
        prefetcher while window w still trains, allgather its rows, join the
        insert plan, and start the padded insert/evict H2D. Called from the
        main loop right after the FIRST block of each window: a point that
        is the same on every host (block caps are pure functions of shared
        state), so the allgather keeps the hosts' collective sequences
        identical — the reason the threaded _WindowStager cannot serve
        multi-host. The occupancy replay (apply_plan_spec) stays at the
        boundary: probe/insert serialization invariant (train/pipeline.py).

        Exactness matches the single-host stager's documented envelope:
        plan metadata is shadow-planned (bit-identical); window row VALUES
        were already gathered at window production, so the only re-timed
        surface is the prefetcher's next gather moving one FIFO slot
        earlier — the reference's eventually-consistent writeback envelope
        (cache_manager.py:48-64). Cost: one extra window's rows + insert
        payload held until the boundary."""
        window = self.prefetcher.get_window()
        if window is None:
            self._mh_pending = (None, None, None)
            return
        rows = self._exchange_window(window.uniques, window.rows)
        staged = None
        if window.plan_spec is not None:
            plan = build_insert_plan(window.plan_spec, rows, self.geo.dim)
            staged = (plan, self._refill_device_inputs(plan))
        self._mh_pending = (window, rows, staged)
        self.mh_prefetches += 1

    def _apply_refill(self, window: WindowData, staged=None,
                      rows_exchanged=None) -> None:
        t0 = time.perf_counter()
        rows = window.rows
        if self.multihost:
            # reassemble the full window from per-host owned slices (one
            # fixed-shape allgather; parallel/multihost.py), then serve this
            # window's train misses from it. rows_exchanged: the allgather
            # already ran mid-previous-window (_prefetch_next_window)
            if rows_exchanged is not None:
                rows = rows_exchanged
            else:
                rows = self._exchange_window(window.uniques, rows)
            self._window_store = WindowRowStore(window.uniques, rows)
        if staged is not None:
            # prestaged by the _WindowStager: plan already joined and the
            # padded device transfers already in flight — only the
            # occupancy replay (and, under adagrad_master_state, the
            # boundary-fenced resume-accumulator gather) remains for the
            # critical path
            plan, d_inputs = staged
            d_inputs = self._complete_staged_acc(plan, d_inputs)
            self.controller.apply_plan_spec(window.plan_spec)
        else:
            if window.plan_spec is not None:
                # shadow-planned window (cache/prefetcher.py): replay the
                # occupancy mutations and join the row values — planning
                # already happened off the refill critical path, on the
                # prefetcher
                plan = build_insert_plan(window.plan_spec, rows, self.geo.dim)
                self.controller.apply_plan_spec(window.plan_spec)
            else:
                plan = self.controller.plan_insert(window.uniques, rows)
            d_inputs = self._refill_device_inputs(plan)
        # occupancy is final for this window — adopt its negotiated staging
        # buckets (multihost: host-symmetric shapes; scan: batches stacked
        # in one block must share shapes)
        self._apply_window_stats(window)
        ev_acc = None
        if self._acc_master is not None:
            # master-state adagrad: (…, insert_acc) rides last; the step
            # returns the evicted accumulator values with the rows
            (self.cache, self.embed_acc, evicted, ev_acc) = self.refill_step(
                self.cache, *d_inputs[:3], self.embed_acc, d_inputs[3],
            )
        elif self._adagrad:
            self.cache, self.embed_acc, evicted = self.refill_step(
                self.cache, *d_inputs, self.embed_acc,
            )
        else:
            self.cache, evicted = self.refill_step(
                self.cache, *d_inputs,
            )
        n_evict = plan.evict_slots.shape[0]
        if n_evict:
            # replica-0-broadcast values (train/step.py make_refill_step):
            # identical on every host; sharded masters keep owned rows only.
            # Materialization is DEFERRED to the eviction thread (forcing the
            # D2H here would block the train loop on the whole transfer), but
            # the transfer STARTS now so queued windows drain at link speed
            # instead of pinning device buffers until the thread catches up.
            shard = evicted.addressable_shards[0].data
            try:
                shard.copy_to_host_async()
            except AttributeError:
                pass

            def _fetch(shard=shard, n=n_evict):
                return np.asarray(shard)[:n].astype(np.float32, copy=False)

            item = (plan.evict_tables, plan.evict_idxs, _fetch)
            if ev_acc is not None:
                # 4th element = the evicted accumulators, same deferred-
                # fetch protocol (EvictionManager._apply len-4 dispatch)
                acc_shard = ev_acc.addressable_shards[0].data
                try:
                    acc_shard.copy_to_host_async()
                except AttributeError:
                    pass
                item += (
                    lambda shard=acc_shard, n=n_evict:
                        np.asarray(shard)[:n].astype(np.float32, copy=False),
                )
            self.eviction_fifo.put(item)
        self.metrics.caching_overhead_s += time.perf_counter() - t0
        self.metrics.refills += 1

    def _apply_window_stats(self, window: WindowData) -> None:
        """Adopt the window's shadow-computed probe statistics
        (WindowData.stats; post-refill occupancy): negotiated per-window
        staging buckets, identically computable on EVERY host with zero
        communication — the index stream is globally shared and occupancy
        metadata is bit-identical across hosts (module doc,
        parallel/multihost.py), so the post-refill per-replica miss and
        dedup-unique counts — and hence the pow2 buckets — agree everywhere.
        Replaces the worst-case T * aux_capacity staging shape (at Terabyte
        geometry that was ~50 MB/step of mostly-padding H2D). The stats are
        computed by the prefetcher's shadow controller WHILE the window
        streams (cache/prefetcher.py _window_stats) — no batch retention, no
        dataset replay pass (the round-2 design re-read the whole stream
        once more per window at long-lookahead configs)."""
        stats = window.stats
        if stats is None:
            return
        self._aux_bucket_window = min(
            pow2_bucket(stats.worst_miss), self._aux_bucket
        )
        if stats.worst_uniq > 0:
            self._dedup_bucket_window = min(
                pow2_bucket(1 + stats.worst_uniq, min_size=1024),
                self._dedup_bucket,
            )
        if self._dedup_auto and stats.total_lookups > 0:
            # measured break-evens (PERF.md findings 8 + round 3): on the
            # PACKED wire, coalescing + the ~3.7 ms device decode mean dedup
            # wins once duplicates reach half the lookups (U <= 0.5 N); on
            # the UNPACKED wire the decode vanishes and dedup already beat
            # plain by 16% at the measured U = 0.57 N point — threshold 0.75
            # keeps a conservative margin toward U ~ N where it's a wash.
            # Either way it is the guard against the duplicate-heavy scatter
            # cliff (finding 9). Window boundaries are exactly where wire
            # format + compiled step may switch together (the pipeline
            # probes the next window only after this refill is applied).
            thresh = 0.5 if self._wire_pack else 0.75
            self._dedup = stats.total_uniq <= thresh * stats.total_lookups
        if self._hot:
            # hot tier: stage this window's hot list (padded with the trash
            # row, which always occupies the last position — masked/padded
            # lookups resolve there and never consume cold capacity) and
            # adopt the exactly-negotiated cold compaction bucket
            hs = (
                window.hot_slots if window.hot_slots is not None
                else np.zeros(0, np.int64)
            )
            arr = np.full(self._hot, self.geo.trash_row, np.int64)
            n = min(hs.size, self._hot - 1)
            arr[:n] = hs[:n]
            npad = self._hot - 1 - n
            if npad > 0:
                # DISTINCT pad rows (descending from trash): pads receive
                # only the float-identity -0.0 update, and a duplicate-trash
                # pad block would form a same-index scatter chain — the
                # XLA:TPU serialization cliff (PERF.md finding 9). The
                # descending range lands in the aux staging region, so a
                # miss lane whose aux slot collides with a pad is classified
                # hot for that step — still numerically exact (the hot path
                # accumulates the same gradient the cold path would have
                # scattered; verified by the hot-tier equivalence tests),
                # just a subtle routing case worth naming.
                arr[n:-1] = (
                    self.geo.trash_row - 1 - np.arange(npad)
                ) % max(1, self.geo.trash_row)
            self._hot_slots_dev = put_global(
                np.sort(arr).astype(np.int32), self._shardings["rep"],
                (self._hot,),
            )
            self._cold_bucket_window = pow2_bucket(
                max(stats.worst_cold, 1), min_size=64
            )

    # ------------------------------------------------------------------ batch
    def _pack_aux(self, aux_slot_shards, aux_row_shards, for_eval=False):
        """Pack per-replica miss rows into a common pow2 bucket (DESIGN.md
        D6); padding scatters into the trash row. Multi-host: the bucket is
        part of the GLOBAL array shape, so it must be host-symmetric — train
        batches use the per-window negotiated bucket (_window_buckets),
        eval the worst case (eval misses are not window-bounded). Returns
        flat [n_local*k] buffers + k."""
        if self.multihost or (self._scan_block > 1 and not for_eval):
            if for_eval:
                # per-eval-batch negotiated bucket (see _assemble); falls
                # back to the worst case only if negotiation didn't run
                k = (
                    self._eval_bucket_batch
                    if self._eval_bucket_batch is not None
                    else self._aux_bucket
                )
            elif self._aux_bucket_window is not None:
                k = self._aux_bucket_window
            else:
                k = self._aux_bucket
        else:
            # single-host per-batch bucket, MONOTONE (running max): a fresh
            # pow2 per batch made every bucket change a new compiled-step
            # variant — on slow-dispatch links each variant load stalls an
            # eval batch ~3.5 s (measured); the running max converges after
            # at most log-many growths and stays stable
            key = "eval" if for_eval else "train"
            k = pow2_bucket(max(a.shape[0] for a in aux_slot_shards))
            k = self._bucket_run_max[key] = max(self._bucket_run_max[key], k)
        aux_slots = np.full((self.n_local, k), self.geo.trash_row, dtype=np.int32)
        aux_rows = np.zeros(
            (self.n_local, k, self.geo.dim), dtype=self._row_wire_dtype
        )
        for k_loc in range(self.n_local):
            n = aux_slot_shards[k_loc].shape[0]
            if n > k:
                raise ValueError(
                    f"{n} packed miss rows exceed aux bucket {k}; raise "
                    "--aux-bucket"
                )
            aux_slots[k_loc, :n] = aux_slot_shards[k_loc]
            aux_rows[k_loc, :n] = aux_row_shards[k_loc]
        return aux_slots.reshape(-1), aux_rows.reshape(-1, self.geo.dim), k

    def _dummy_mask(self, t_count: int, n_local_rows: int, b_glob: int):
        """The all-False mask never changes: reuse one device constant."""
        key = (t_count, n_local_rows)
        mask_dev = self._dummy_masks.get(key)
        if mask_dev is None:
            mask_dev = put_global(
                np.zeros(key, dtype=bool), self._shardings["slots"],
                (t_count, b_glob),
            )
            self._dummy_masks[key] = mask_dev
        return mask_dev

    def _assemble_dedup(self, batch: Batch, b_loc: int):
        """Train-batch assembly in the dedup wire format (StepConfig.dedup):
        per local replica, probe_dedup emits bit-packed first-seen ranks +
        the unique-slot list; the device segment-sums duplicate gradients
        and scatters only unique rows (PERF.md finding 4 attack)."""
        ls_i = batch.ls_i
        mask = batch.ls_mask
        t_count = ls_i.shape[0]
        if mask is not None and ls_i.shape[2] != self.pooled_width:
            raise ValueError(
                f"batch pooled width {ls_i.shape[2]} != trainer pooled_width "
                f"{self.pooled_width}"
            )
        if mask is None and self.pooled_width:
            raise ValueError("trainer built for pooled batches, got single-index")

        if not self.multihost:
            probe_masters = [self.master] * self.n_local
        else:
            assert self._window_store is not None, "probe before first refill"
            probe_masters = [self._window_store] * self.n_local

        inv_shards, uniq_lists, count_lists = [], [], []
        aux_slot_shards, aux_row_shards = [], []
        stats = _ProbeStats(t_count)
        # packed: bit-packed ranks + table-local unique wire (tunnel/thin
        # links); unpacked (pack_wire off): raw int32 ranks + GLOBAL unique
        # rows — skips the ~3.7 ms device wire decode (PERF.md round 3)
        if self._wire_pack:
            probe = functools.partial(
                self.controller.probe_dedup, inv_bits=self._inv_bits
            )
        else:
            probe = functools.partial(
                self.controller.probe_dedup_raw,
                sort=self.step_cfg_dedup.sorted_wire,
            )
        for k_loc, r in enumerate(self.local_ids):
            sl = slice(r * b_loc, (r + 1) * b_loc)
            if mask is None:
                dr = probe(ls_i[:, sl], probe_masters[k_loc])
            else:
                dr = probe(
                    ls_i[:, sl].reshape(t_count, -1),
                    probe_masters[k_loc],
                    valid=mask[:, sl].reshape(t_count, -1),
                )
            inv_shards.append(dr.inv_wire)
            uniq_lists.append(dr.uniq)
            count_lists.append(dr.uniq_counts)
            aux_slot_shards.append(dr.aux_slots)
            aux_row_shards.append(dr.aux_rows)
            stats.add(dr.hit_counts, dr.num_lookups)

        # unique-list bucket: pow2 so compiled variants stay logarithmic;
        # +1 for the reserved trash rank at position 0. Multi-host and scan
        # blocks need a shape fixed across hosts/batches: the per-window
        # negotiated bucket (derived identically everywhere from shared
        # metadata, _window_buckets).
        if self.multihost or self._scan_block > 1:
            ub = (
                self._dedup_bucket_window
                if self._dedup_bucket_window is not None
                else self._dedup_bucket
            )
        else:
            # monotone like _pack_aux's single-host buckets (compile churn)
            ub = pow2_bucket(1 + max(u.size for u in uniq_lists), min_size=1024)
            ub = self._bucket_run_max["dedup"] = max(
                self._bucket_run_max["dedup"], ub
            )
        uniq_bits = self._wire_bits
        if self._wire_pack:
            ubytes = step_lib.wire_bytes(ub, uniq_bits)
            uniq_wire = np.empty((self.n_local, ubytes), np.uint8)
        else:
            uniq_wire = np.empty((self.n_local, ub), np.int32)
        uniq_counts = np.zeros((self.n_local, t_count), np.int32)
        offs = self.geo.table_offsets
        for k_loc in range(self.n_local):
            u, cnt = uniq_lists[k_loc], count_lists[k_loc]
            if u.size + 1 > ub:
                raise ValueError(
                    f"{u.size + 1} unique slots exceed dedup bucket {ub}"
                )
            if not self._wire_pack:
                # unpacked: GLOBAL rows directly. Default layout: position 0
                # + padding are the trash row. Sorted wire: ascending slots
                # from position 0, trash padding at the tail (still globally
                # sorted — the bucket guard above keeps >=1 trailing trash
                # slot for masked ranks). Step _decode_dedup_raw contract.
                row = np.full(ub, self.geo.trash_row, np.int32)
                if self.step_cfg_dedup.sorted_wire:
                    row[: u.size] = u
                else:
                    row[1 : 1 + u.size] = u
                uniq_wire[k_loc] = row
                uniq_counts[k_loc] = cnt
                continue
            vals = np.full(ub, -1, np.int64)  # -1 -> sentinel (trash/pad)
            vals[1 : 1 + u.size] = u.astype(np.int64) - np.repeat(offs, cnt)
            if native.available():
                uniq_wire[k_loc] = native.pack_bits(vals, uniq_bits, ubytes)
            else:
                uniq_wire[k_loc] = step_lib.pack_slots(
                    vals[None, :], np.zeros(1, np.int64), -1, uniq_bits
                )[0]
            uniq_counts[k_loc] = cnt

        inv_wire = (
            inv_shards[0] if self.n_local == 1
            else np.concatenate(inv_shards, axis=1)
        )
        aux_slots, aux_rows, k = self._pack_aux(aux_slot_shards, aux_row_shards)

        sh = self._shardings
        b_glob = self.ndev * b_loc
        lo, hi = self.local_ids[0] * b_loc, (self.local_ids[-1] + 1) * b_loc
        x_local = batch.x[lo:hi]
        if self.cfg.wire_x_fp8:
            x_local = x_local.astype(jnp.float8_e4m3fn)
        elif self.cfg.compute_dtype == "bfloat16":
            x_local = x_local.astype(jnp.bfloat16)
        y_local = batch.y[lo:hi]
        if self.cfg.round_targets:
            y_local = y_local.astype(np.uint8)
        ib_glob = inv_wire.shape[1] * self.ndev // self.n_local

        # block-coalesce: run_block needs the HOST-side unique lists to build
        # the block union + per-step block ranks (uniq padded to the same ub
        # the wire was staged with — the rank rows must align positionally)
        blockinfo = None
        if self._block_coalesce and not self._wire_pack:
            blockinfo = (uniq_lists, count_lists, ub)

        if mask is None:
            mask_dev = self._dummy_mask(t_count, hi - lo, b_glob)
            staged = put_global_many(
                (x_local, inv_wire, uniq_wire.reshape(-1),
                 uniq_counts.reshape(-1), aux_slots, aux_rows, y_local),
                (sh["batch0"], sh["slots"], sh["lead"], sh["lead"],
                 sh["lead"], sh["lead"], sh["batch0"]),
                ((b_glob,) + x_local.shape[1:],
                 (t_count, ib_glob),
                 (self.ndev * uniq_wire.shape[1],),
                 (self.ndev * t_count,),
                 (self.ndev * k,),
                 (self.ndev * k, self.geo.dim),
                 (b_glob,) + y_local.shape[1:]),
            )
            return (staged[0], staged[1], mask_dev, staged[2], staged[3],
                    staged[4], staged[5], staged[6]), stats, True, blockinfo

        mask_local = mask[:, lo:hi]
        mask_glob = (t_count, b_glob) + mask.shape[2:]
        staged = put_global_many(
            (x_local, inv_wire, mask_local, uniq_wire.reshape(-1),
             uniq_counts.reshape(-1), aux_slots, aux_rows, y_local),
            (sh["batch0"], sh["slots"], sh["slots"], sh["lead"], sh["lead"],
             sh["lead"], sh["lead"], sh["batch0"]),
            ((b_glob,) + x_local.shape[1:],
             (t_count, ib_glob),
             mask_glob,
             (self.ndev * uniq_wire.shape[1],),
             (self.ndev * t_count,),
             (self.ndev * k,),
             (self.ndev * k, self.geo.dim),
             (b_glob,) + y_local.shape[1:]),
        )
        return staged, stats, True, blockinfo

    def _assemble(self, batch: Batch, b_loc: int):
        """Probe this process's DP shards and build (global) sharded device
        arrays for a TRAIN batch. Multi-hot batches ([T, B, P] + mask) are
        probed flattened; masked positions resolve to the trash row.

        Multi-host: every host sees the full batch but probes/stages only its
        local replicas; train misses are served from the exchanged window
        store. (Eval assembly lives in _probe_eval/_stage_eval — split so the
        serving pipeline can probe ahead while the device runs.)"""
        if self._dedup:
            return self._assemble_dedup(batch, b_loc)
        ls_i = batch.ls_i
        mask = batch.ls_mask
        t_count = ls_i.shape[0]
        if mask is not None:
            p = ls_i.shape[2]
            if p != self.pooled_width:
                raise ValueError(
                    f"batch pooled width {p} != trainer pooled_width "
                    f"{self.pooled_width}"
                )
        elif self.pooled_width:
            raise ValueError("trainer built for pooled batches, got single-index")

        if not self.multihost:
            probe_masters = [self.master] * self.n_local
        else:
            assert self._window_store is not None, "probe before first refill"
            probe_masters = [self._window_store] * self.n_local

        probe_fn = self._probe_fn
        slots_shards, aux_slot_shards, aux_row_shards = [], [], []
        stats = _ProbeStats(t_count)
        for k_loc, r in enumerate(self.local_ids):
            sl = slice(r * b_loc, (r + 1) * b_loc)
            if mask is None:
                pr = probe_fn(ls_i[:, sl], probe_masters[k_loc])
            else:
                pr = probe_fn(
                    ls_i[:, sl].reshape(t_count, -1),
                    probe_masters[k_loc],
                    valid=mask[:, sl].reshape(t_count, -1),
                )
            slots_shards.append(pr.slots)
            aux_slot_shards.append(pr.aux_slots)
            aux_row_shards.append(pr.aux_rows)
            stats.add(pr.hit_counts, pr.num_lookups)

        slots = (
            slots_shards[0] if len(slots_shards) == 1
            else np.concatenate(slots_shards, axis=1)
        )
        aux_slots, aux_rows, k = self._pack_aux(aux_slot_shards, aux_row_shards)

        sh = self._shardings
        b_glob = self.ndev * b_loc
        lo, hi = self.local_ids[0] * b_loc, (self.local_ids[-1] + 1) * b_loc
        n_glob = slots.shape[1] * self.ndev // self.n_local

        # wire narrowing (lossless; per-step H2D bytes are the binding
        # constraint on slow host links): 3-byte local slot ids (already in
        # wire format from probe_wire), bf16 dense features when the MLP
        # casts to bf16 anyway, uint8 0/1 targets
        slots_glob = (t_count, n_glob)
        x_local = self._wire_x(batch.x[lo:hi])
        y_local = batch.y[lo:hi]
        if self.cfg.round_targets:
            y_local = y_local.astype(np.uint8)

        if mask is None:
            mask_dev = self._dummy_mask(t_count, hi - lo, b_glob)
            staged = put_global_many(
                (x_local, slots, aux_slots, aux_rows, y_local),
                (sh["batch0"], sh["slots"], sh["lead"], sh["lead"], sh["batch0"]),
                ((b_glob,) + x_local.shape[1:],
                 slots_glob,
                 (self.ndev * k,),
                 (self.ndev * k, self.geo.dim),
                 (b_glob,) + y_local.shape[1:]),
            )
            inputs = (staged[0], staged[1], mask_dev, staged[2], staged[3],
                      staged[4])
            return inputs, stats, False, None

        mask_local = mask[:, lo:hi]
        mask_glob = (t_count, b_glob) + mask.shape[2:]
        inputs = put_global_many(
            (x_local, slots, mask_local, aux_slots, aux_rows, y_local),
            (sh["batch0"], sh["slots"], sh["slots"], sh["lead"], sh["lead"],
             sh["batch0"]),
            ((b_glob,) + x_local.shape[1:],
             slots_glob,
             mask_glob,
             (self.ndev * k,),
             (self.ndev * k, self.geo.dim),
             (b_glob,) + y_local.shape[1:]),
        )
        return inputs, stats, False, None

    def _wire_x(self, x_local: np.ndarray):
        if self.cfg.wire_x_fp8:
            return x_local.astype(jnp.float8_e4m3fn)
        if self.cfg.compute_dtype == "bfloat16":
            return x_local.astype(jnp.bfloat16)
        return x_local

    # ------------------------------------------------------------- eval path
    def _probe_eval(self, batch: Batch, b_loc: int):
        """Host-only half of eval assembly: bucket negotiation + probe +
        miss-row gather/collection. NO collectives and no device dispatch —
        safe to run on the serving pipeline thread for batch i+1 while the
        device runs batch i (round-3 verdict item 1; the round-3 eval loop
        ran this strictly serially with the forward)."""
        ls_i = batch.ls_i
        mask = batch.ls_mask
        t_count = ls_i.shape[0]
        if mask is not None:
            if ls_i.shape[2] != self.pooled_width:
                raise ValueError(
                    f"batch pooled width {ls_i.shape[2]} != trainer "
                    f"pooled_width {self.pooled_width}"
                )
        elif self.pooled_width:
            raise ValueError("trainer built for pooled batches, got single-index")

        eval_bucket = None
        if self.multihost:
            # negotiated per-eval-batch miss bucket (VERDICT r2 item 5): the
            # eval stream and occupancy metadata are host-identical, so
            # every host computes the same GLOBAL worst-case per-replica
            # miss count locally — zero communication, exact shape, pow2 to
            # bound the compile-variant count. Replaces the worst-case
            # T * aux_capacity staging shape (~50 MB of mostly-padding H2D
            # per eval batch at Terabyte geometry). Occupancy is frozen
            # during eval (no refills), so the count is stable. The bucket
            # rides WITH the probed item (the pipeline probes ahead, so
            # instance state would be overwritten before staging reads it).
            worst = 1
            for r in range(self.ndev):
                sl = slice(r * b_loc, (r + 1) * b_loc)
                v = None if mask is None else mask[:, sl].reshape(t_count, -1)
                worst = max(worst, self.controller.count_misses(
                    ls_i[:, sl].reshape(t_count, -1), valid=v
                ))
            eval_bucket = min(pow2_bucket(worst), self._aux_bucket)
            self._eval_bucket_log.append((eval_bucket, worst))
            probe_masters = [
                CollectingMaster(self.geo.dim) for _ in self.local_ids
            ]
        else:
            probe_masters = [self.master] * self.n_local

        probe_fn = self._probe_fn
        slots_shards, aux_slot_shards, aux_row_shards = [], [], []
        for k_loc, r in enumerate(self.local_ids):
            sl = slice(r * b_loc, (r + 1) * b_loc)
            if mask is None:
                pr = probe_fn(ls_i[:, sl], probe_masters[k_loc])
            else:
                pr = probe_fn(
                    ls_i[:, sl].reshape(t_count, -1),
                    probe_masters[k_loc],
                    valid=mask[:, sl].reshape(t_count, -1),
                )
            slots_shards.append(pr.slots)
            aux_slot_shards.append(pr.aux_slots)
            aux_row_shards.append(pr.aux_rows)
            self.metrics.eval_hits += int(pr.hit_counts.sum())
            self.metrics.eval_lookups += pr.num_lookups
        return (batch, slots_shards, aux_slot_shards, aux_row_shards,
                probe_masters, eval_bucket)

    def _stage_eval(self, probed, b_loc: int):
        """Second half of eval assembly: the (collective-bearing, multihost)
        miss-row exchange + packing + H2D staging. Called on the MAIN thread
        in batch order, so every host's collective sequence stays aligned.
        Returns the eval-step device inputs (no target staging: eval
        accuracy/AUC are computed host-side from batch.y, so shipping y was
        pure wasted H2D)."""
        (batch, slots_shards, aux_slot_shards, aux_row_shards,
         probe_masters, eval_bucket) = probed
        mask = batch.ls_mask
        t_count = batch.ls_i.shape[0]
        if self.multihost:
            self._eval_bucket_batch = eval_bucket
            # ONE exchange per eval batch on every host (collective alignment
            # requires the call even with zero local misses)
            requests = [rq for m in probe_masters for rq in m.requests]
            fetched = self._row_exchange.fetch(requests)
            pos = 0
            for k_loc, m in enumerate(probe_masters):
                parts = fetched[pos : pos + len(m.requests)]
                pos += len(m.requests)
                if parts:
                    aux_row_shards[k_loc] = np.concatenate(parts)

        slots = (
            slots_shards[0] if len(slots_shards) == 1
            else np.concatenate(slots_shards, axis=1)
        )
        aux_slots, aux_rows, k = self._pack_aux(
            aux_slot_shards, aux_row_shards, for_eval=True
        )
        sh = self._shardings
        b_glob = self.ndev * b_loc
        lo, hi = self.local_ids[0] * b_loc, (self.local_ids[-1] + 1) * b_loc
        n_glob = slots.shape[1] * self.ndev // self.n_local
        x_local = self._wire_x(batch.x[lo:hi])

        if mask is None:
            mask_dev = self._dummy_mask(t_count, hi - lo, b_glob)
            staged = put_global_many(
                (x_local, slots, aux_slots, aux_rows),
                (sh["batch0"], sh["slots"], sh["lead"], sh["lead"]),
                ((b_glob,) + x_local.shape[1:],
                 (t_count, n_glob),
                 (self.ndev * k,),
                 (self.ndev * k, self.geo.dim)),
            )
            return (staged[0], staged[1], mask_dev, staged[2], staged[3])
        mask_local = mask[:, lo:hi]
        mask_glob = (t_count, b_glob) + mask.shape[2:]
        return put_global_many(
            (x_local, slots, mask_local, aux_slots, aux_rows),
            (sh["batch0"], sh["slots"], sh["slots"], sh["lead"], sh["lead"]),
            ((b_glob,) + x_local.shape[1:],
             (t_count, n_glob),
             mask_glob,
             (self.ndev * k,),
             (self.ndev * k, self.geo.dim)),
        )

    # ------------------------------------------------------------------ train
    def _start_pipeline(self) -> None:
        """Start the host pipeline ONCE: prefetcher, eviction manager, and
        the assembly pipeline all stream the dataset continuously, so
        repeated train() calls resume mid-stream with windows still aligned
        (a fresh per-call pipeline would restart the batch stream while the
        prefetcher kept going — silently desynced refills)."""
        if not self._pipeline_started:
            from cdlrm_tpu.train.pipeline import AssemblyPipeline

            cfg = self.cfg
            epoch0, j0 = self._cursor
            self.eviction_manager.start()
            # the prefetcher resumes at the cursor's WINDOW start; a
            # mid-window cursor makes the pipeline emit WINDOW_REPLAY so the
            # already-applied insert plan is not repeated
            self.prefetcher = LookaheadPrefetcher(
                cache_stream_fn=self._cache_stream,
                master=self.master,
                lookahead=cfg.lookahead,
                batch_fifo_size=cfg.batch_fifo_size,
                cache_workers=cfg.cache_workers,
                nepochs=cfg.nepochs,
                pin_core=cfg.main_start_core + 1 if cfg.pin_cores else None,
                worker_pin_base=(
                    cfg.main_start_core + 3 if cfg.pin_cores else None
                ),
                backend=cfg.prefetch_backend,
                start_epoch=epoch0,
                skip_batches=(j0 // cfg.lookahead) * cfg.lookahead,
                # shadow planner: a clone of the controller's CURRENT state
                # (fresh, or checkpoint-loaded) that the prefetcher advances
                # one plan per window ahead of the trainer. A mid-window
                # cursor means the first re-produced window's plan is already
                # in the checkpointed occupancy/RNG — skip planning it.
                shadow=self.controller.clone(),
                stats_spec=(
                    (
                        self.ndev,
                        cfg.local_batch_size,
                        self._dedup or self._dedup_auto,
                        self._hot,
                    )
                    if self._need_stats else None
                ),
                skip_first_plan=(j0 % cfg.lookahead != 0),
            )
            self.prefetcher.start()
            # refill prestager (config.refill_prestage doc). Single-host:
            # a thread (_WindowStager). Multi-host: the window rows need
            # the collective-ordered allgather, which must stay on the
            # MAIN thread — so the main loop itself runs the boundary's
            # host half one window early, at a deterministic mid-window
            # point (_prefetch_next_window).
            self._stager = None
            if cfg.refill_prestage and not self.multihost:
                self._stager = _WindowStager(self)
                self._stager.start()
            self._mh_prestage = cfg.refill_prestage and self.multihost
            self._mh_pending: Optional[tuple] = None
            self._mh_want_prefetch = False
            self.mh_prefetches = 0  # observability + test pin
            self._pipe = AssemblyPipeline(
                self, cfg.nepochs, cfg.lookahead,
                max(1, cfg.pipeline_depth),
                start_epoch=epoch0, start_j=j0,
            )
            self._pipe.start()
            self._stream_done = False
            self._pipeline_started = True

    def _get_step(self, size: int, dedup: bool, coalesce: bool = False):
        """Compiled train step for ``size`` consecutive batches (size 1 =
        the plain single step; >1 = a scan block, train/step.py
        make_cached_train_step(block=size)) in the given wire format; cached
        per (size, dedup, cold bucket, coalesce) — blocks only take sizes in
        {scan_steps} plus cadence/window remainders and cold buckets are
        pow2, so the variant count stays small."""
        cold = self._cold_bucket_window if self._hot else 0
        key = (size, dedup, cold, coalesce)
        fn = self._step_cache.get(key)
        if fn is None:
            scfg = self.step_cfg_dedup if dedup else self.step_cfg
            if self._hot:
                scfg = scfg._replace(hot_rows=self._hot, cold_bucket=cold)
            if coalesce:
                scfg = scfg._replace(block_coalesce=True)
            fn = step_lib.make_cached_train_step(
                self.mesh, self.geo, scfg, self.pooled_width, block=size,
            )
            self._step_cache[key] = fn
        return fn

    @staticmethod
    def interleave_block_inputs(inputs_list, ranks) -> list:
        """Coalesced scan-block input order: each step's dedup inputs with
        its block-rank row spliced at position 5 — right after uniq_counts,
        the step's batch_specs order (train/step.py block_coalesce). The
        ONE place this interleave lives: run_block and bench.py's
        device_block_ms probe both dispatch through it, so a batch_specs
        reorder cannot drift them apart."""
        flat = []
        for i, inputs in enumerate(inputs_list):
            flat.extend(inputs[:5])
            flat.append(ranks[i])
            flat.extend(inputs[5:])
        return flat

    def _build_block_union(self, infos):
        """Block-coalesce host pass (run at dispatch): per local replica,
        union the block's unique CACHE slots (aux-region and trash slots
        excluded — StepConfig.block_coalesce doc) and emit each step's
        block-rank row aligned with its staged uniq wire. Returns staged
        device arrays (per-step rank rows, the trash-padded sorted union,
        per-replica counts).

        Implementation is a BITMAP over the flat per-replica slot space —
        O(N + R) with tiny constants, no sorts: mark the block's slots
        present, AND with the static real-row mask (aux/trash excluded),
        the sorted union falls out of the bitmap scan, and a reusable
        slot->rank map replaces the per-step searchsorted. Identical
        output to the original np.unique+searchsorted form (np.unique's
        output is sorted ascending, exactly the bitmap-scan order) —
        measured 128 -> 38 ms per 10-step block at headline geometry on
        this 1-core host for the numpy form (chipqueue/ab_block_auto2.log).
        The native kernel (csrc cdlrm_block_union/_ranks, bit-identical,
        pinned in tests/test_native.py) takes the int32 wire dtype
        directly, ANDs a once-built word bitmap of the static real mask
        instead of a byte read per marked slot, and writes rank rows
        in place into the replica-strided staging array: 7.5 ms/block
        (0.75 ms/step) at the same geometry (PERF.md round 5 cont.). A
        production host additionally overlaps this in the assembly
        pipeline the way the probe already is."""
        _, counts0, ub = infos[0]
        t_count = counts0[0].size
        geo = self.geo
        if self._blk_real_mask is None:
            real = np.zeros(geo.total_rows, bool)
            for t in range(t_count):
                real[int(geo.table_offsets[t]): int(geo.aux_base(t))] = True
            self._blk_real_mask = real
            if native.available():
                # one-time LSB-first word bitmap of the static mask: the
                # per-block native union ANDs words instead of paying a
                # random byte read per marked slot
                self._blk_real_bits = native.mask_bits(
                    real.astype(np.uint8)
                )
            # slot -> block rank, PER REPLICA (phase 1 primes every
            # replica's map before phase 2 consumes them — one shared map
            # would cross-clobber), lazily reset per block (union entries
            # only); -1 = not in this block's union -> trash rank
            self._blk_rank_map = [
                np.full(geo.total_rows, -1, np.int32)
                for _ in range(self.n_local)
            ]
        for _, _, ub_i in infos:
            if ub_i != ub:
                # blocks never cross windows and the bucket is negotiated
                # per window, so a mismatch means the invariant broke
                raise RuntimeError(
                    f"dedup bucket changed within a scan block ({ub_i} vs "
                    f"{ub})"
                )
        use_native = native.available()
        cats, offs, unions, p_need = [], [], [], 1
        # primed rank maps are reset in the finally below — NOT inline in
        # phase 2 — so an exception anywhere past priming (allgather
        # failure, staging error) can never leave stale slot->rank entries
        # to poison the next block's rows (the maps' all--1 precondition)
        primed: List[Tuple[np.ndarray, np.ndarray]] = []
        try:
            for k_loc in range(self.n_local):
                cat = np.concatenate([info[0][k_loc] for info in infos])
                off = np.zeros(len(infos) + 1, np.int64)
                np.cumsum(
                    [info[0][k_loc].size for info in infos], out=off[1:]
                )
                rmap = self._blk_rank_map[k_loc]
                union = None
                if use_native:
                    try:
                        union = native.block_union(
                            cat, self._blk_real_bits, geo.total_rows, rmap
                        )
                    except MemoryError:
                        union = None  # bitmap calloc failed: numpy fallback
                if union is None:
                    present = np.zeros(geo.total_rows, bool)
                    present[cat] = True
                    present &= self._blk_real_mask
                    union = np.flatnonzero(present)
                    rmap[union] = np.arange(union.size, dtype=np.int32)
                primed.append((rmap, union))
                cats.append(cat)
                offs.append(off)
                unions.append(union)
                # +1: the last pending row is the trash rank — keep a pad
                p_need = max(p_need, union.size + 1)
            if self.multihost:
                # the pending buffer's bucket is a compiled GLOBAL shape,
                # so every host must adopt the same one — one tiny
                # allgather-max per scan block on the main thread.
                # Collective-order safety: block boundaries and the
                # coalesce decision are pure functions of host-identical
                # state (config + window stats + stream), so every host
                # issues this at the identical point in its sequence (the
                # module invariant; parallel/multihost.py doc).
                from jax.experimental import multihost_utils

                p_need = int(np.max(multihost_utils.process_allgather(
                    np.asarray(p_need, np.int64)
                )))
            p_bucket = pow2_bucket(p_need, min_size=1024)
            p_bucket = self._bucket_run_max["blk"] = max(
                self._bucket_run_max["blk"], p_bucket
            )
            p_trash = p_bucket - 1
            blk_slots = np.full(
                (self.n_local, p_bucket), geo.trash_row, np.int32
            )
            blk_counts = np.zeros(self.n_local, np.int32)
            for k_loc, union in enumerate(unions):
                blk_slots[k_loc, : union.size] = union
                blk_counts[k_loc] = union.size
            base = 0 if self.step_cfg_dedup.sorted_wire else 1
            # native block_ranks fills every position itself (empty is
            # enough); the numpy form writes only each step's rank span
            # and needs the p_trash pre-fill
            shape = (len(infos), self.n_local, ub)
            rows = (
                np.empty(shape, np.int32) if use_native
                else np.full(shape, p_trash, np.int32)
            )
            for k_loc, union in enumerate(unions):
                rmap = self._blk_rank_map[k_loc]
                if use_native:
                    # in-place into the [K, n_local, ub] staging array's
                    # replica slice — no intermediate array + strided copy
                    native.block_ranks(
                        cats[k_loc], offs[k_loc], rmap, p_trash, ub, base,
                        out=rows[:, k_loc],
                    )
                    continue
                for i, (uniq_lists, _, _) in enumerate(infos):
                    u = uniq_lists[k_loc]
                    r = rmap[u]
                    # aux/trash slots are never in the union: their -1
                    # maps to the trash rank (the old aux_base filter)
                    rows[i, k_loc, base: base + u.size] = np.where(
                        r < 0, p_trash, r
                    )
        finally:
            # lazy reset: union entries only (the maps' all--1 precondition)
            for rmap, union in primed:
                if use_native:
                    native.block_union_reset(union, rmap)
                else:
                    rmap[union] = -1
        rank_rows = list(rows)
        sh = self._shardings
        staged = put_global_many(
            tuple(r.reshape(-1) for r in rank_rows)
            + (blk_slots.reshape(-1), blk_counts),
            (sh["lead"],) * (len(infos) + 2),
            tuple((self.ndev * ub,) for _ in infos)
            + ((self.ndev * p_bucket,), (self.ndev,)),
        )
        return staged[: len(infos)], staged[-2], staged[-1]

    def train(self, max_steps: Optional[int] = None, log_fn=print) -> TrainMetrics:
        """Main loop: consumes batches pre-probed by the AssemblyPipeline
        thread (host probe + H2D staging of batch j+1 overlap device step j,
        train/pipeline.py), applying refills at the window boundaries it
        signals. Periodicities (print/test/agg/checkpoint) are on
        global_step; the reference uses the per-epoch batch index
        (main_no_ddp.py:418,458,479), identical within an epoch."""
        from cdlrm_tpu.train.pipeline import WINDOW_BOUNDARY, WINDOW_REPLAY

        cfg = self.cfg
        self._start_pipeline()
        pipe = self._pipe
        if self._stream_done:
            return self.metrics
        b = cfg.mini_batch_size
        pending: List[Tuple] = []  # (loss_sum, correct, n) device scalars

        def flush_pending():
            if not pending:
                return
            # ONE batched D2H of the scalars' local shards (metrics are
            # psum'd => replica-identical, so the local shard IS the value).
            # No eager ops on the global arrays: multi-host eager dispatch
            # would need every process to enqueue identical programs — a
            # deadlock hazard; reading addressable shards is purely local.
            # idx selects the step's slice of a scan block's stacked [K]
            # outputs (None = scalar single-step outputs). A block's K
            # entries all reference the SAME two stacked arrays — fetch
            # each distinct array once, not K times.
            pos: dict = {}
            fetch: List = []
            for ls, c, _, _ in pending:
                for x in (ls, c):
                    if id(x) not in pos:
                        pos[id(x)] = len(fetch)
                        fetch.append(x.addressable_shards[0].data)
            vals = jax.device_get(fetch)
            for ls, c, n, idx in pending:
                ls_v, c_v = vals[pos[id(ls)]], vals[pos[id(c)]]
                if idx is not None:
                    ls_v, c_v = ls_v[idx], c_v[idx]
                self.metrics.loss_sum += float(ls_v)
                self.metrics.correct += float(c_v)
                self.metrics.examples += n
                self.metrics.steps += 1
            pending.clear()

        def cadence_dist(j, f):
            return f - (j % f) if f and f > 0 else 1 << 30

        def block_cap():
            """Largest scan block starting at the current step that cannot
            cross a cadence boundary — every freq-gated action still fires
            at exactly its global step."""
            j = self.global_step
            cap = self._scan_block
            if max_steps is not None:
                cap = min(cap, max_steps - j)
            if self._needs_agg:
                cap = min(cap, cadence_dist(j, cfg.table_agg_freq))
            cap = min(cap, cadence_dist(j, cfg.print_freq))
            if self.test_dataset is not None and cfg.test_freq > 0:
                cap = min(cap, cadence_dist(j, cfg.test_freq))
            if cfg.checkpoint_freq > 0 and cfg.save_model:
                cap = min(cap, cadence_dist(j, cfg.checkpoint_freq))
            return max(1, cap)

        def after_step(cursor):
            """Per-step bookkeeping + cadences. Scan blocks are capped at
            every cadence boundary (block_cap), so freq-gated actions fire
            at exactly the same global steps as single-step execution."""
            nonlocal window_t0
            self.global_step += 1
            self._cursor = (cursor[0], cursor[1] + 1)
            j = self.global_step

            if self._needs_agg and j % cfg.table_agg_freq == 0:
                if self._adagrad:
                    self.cache, self.touched, self.embed_acc = self.agg_step(
                        self.cache, self.touched, self.embed_acc
                    )
                else:
                    self.cache, self.touched = self.agg_step(
                        self.cache, self.touched
                    )

            if j % cfg.print_freq == 0:
                flush_pending()
                dt = time.perf_counter() - window_t0
                m = self.metrics
                # ms/it excludes the amortized refill cost, which is
                # reported separately — reference semantics
                # (main_no_ddp.py:458-473)
                ms_it = 1000.0 * max(0.0, dt - m.caching_overhead_s) / max(1, m.steps)
                overhead_ms = 1000.0 * m.caching_overhead_s / max(1, m.steps)
                ptr = m.per_table_hit_rates
                self.last_window = {
                    "ms_per_iter": ms_it,
                    "caching_overhead_ms": overhead_ms,
                    "loss": m.loss_sum / max(1, m.examples),
                    "accuracy": m.correct / max(1, m.examples),
                    "hit_rate": m.hit_rate,  # train probes only
                    "eval_hit_rate": m.eval_hit_rate,
                    # first-class per-table hit rates (the reference computes
                    # but comments these out, model_no_ddp.py:206-207);
                    # cumulative over the run, [T] floats
                    "per_table_hit_rates": (
                        None if ptr is None else [round(float(v), 4) for v in ptr]
                    ),
                    "steps": m.steps,
                    # wire format currently active (auto-dedup decision)
                    "dedup": self._dedup,
                    # multi-host refill prestage hoists completed so far
                    # (0 single-host / prestage off)
                    "mh_prefetches": self.mh_prefetches,
                }
                log_fn(
                    f"Step {j}: {ms_it:.2f} ms/it, caching overhead "
                    f"{overhead_ms:.3f} ms/it, loss "
                    f"{m.loss_sum / max(1, m.examples):.5f}, "
                    f"acc {m.correct / max(1, m.examples):.5f}, "
                    f"hit-rate {m.hit_rate:.4f}"
                )
                self._log_metrics("train_window", self.last_window)
                self.metrics.train_time_s += dt
                m.steps = 0
                m.examples = 0
                m.loss_sum = 0.0
                m.correct = 0.0
                m.caching_overhead_s = 0.0
                window_t0 = time.perf_counter()

            if (
                self.test_dataset is not None
                and cfg.test_freq > 0
                and j % cfg.test_freq == 0
            ):
                acc, auc = self.evaluate(log_fn=log_fn)
                if (
                    cfg.mlperf_acc_threshold > 0
                    and acc >= cfg.mlperf_acc_threshold
                ) or (
                    cfg.mlperf_auc_threshold > 0
                    and not np.isnan(auc)
                    and auc >= cfg.mlperf_auc_threshold
                ):
                    log_fn(
                        f"MLPerf threshold reached (acc={acc:.5f}, "
                        f"auc={auc:.5f}); stopping"
                    )
                    self._stop_requested = True

            if (
                cfg.checkpoint_freq > 0
                and j % cfg.checkpoint_freq == 0
                and cfg.save_model
            ):
                self.save_checkpoint(cfg.save_model)

        def run_block(items):
            """One dispatch for len(items) consecutive steps (scan block;
            train/step.py make_cached_train_step(block=...)), or the plain
            single-step call. Per-step metric handling is identical. Each
            item carries the wire format it was assembled in (auto-dedup
            flips only at window boundaries, and blocks never cross one, so
            a block is format-homogeneous)."""
            for _, _, _, st, _, _ in items:
                st.commit(self.metrics)
            dedup = items[0][4]
            if not all(it[4] == dedup for it in items):
                # hard error, not assert: under `python -O` a violated
                # window-boundary invariant would feed dedup-format inputs to
                # a plain-compiled step and silently misread the wire
                raise RuntimeError("mixed wire formats within a scan block")
            # hot tier: the per-window hot list rides as one replicated
            # input before lr (same window for every item in a block)
            hot_extra = (self._hot_slots_dev,) if self._hot else ()
            # adagrad: the optimizer state rides after the batch inputs and
            # comes back updated (train/step.py make_cached_train_step doc)
            opt_extra = (
                (self.dense_acc, self.embed_acc) if self._adagrad else ()
            )
            if len(items) == 1:
                cursor, _, inputs, _, _, _ = items[0]
                out = self._get_step(1, dedup)(
                    self.params, self.cache, self.touched, *inputs,
                    *hot_extra, *opt_extra, self._lr, self._lr_emb,
                )
                if self._adagrad:
                    (self.params, self.cache, self.touched, self.dense_acc,
                     self.embed_acc, loss_sum, correct) = out
                else:
                    (self.params, self.cache, self.touched, loss_sum,
                     correct) = out
                pending.append((loss_sum, correct, b, None))
                after_step(cursor)
            else:
                coalesce = (
                    dedup and self._block_coalesce
                    and all(it[5] is not None for it in items)
                )
                fn = self._get_step(len(items), dedup, coalesce)
                if coalesce:
                    ranks, blk_slots, blk_counts = self._build_block_union(
                        [it[5] for it in items]
                    )
                    flat = self.interleave_block_inputs(
                        [it[2] for it in items], ranks
                    )
                    out = fn(
                        self.params, self.cache, self.touched, *flat,
                        blk_slots, blk_counts, self._lr, self._lr_emb,
                    )
                else:
                    flat = [a for _, _, inputs, _, _, _ in items
                            for a in inputs]
                    out = fn(
                        self.params, self.cache, self.touched, *flat,
                        *hot_extra, *opt_extra, self._lr, self._lr_emb,
                    )
                if self._adagrad:
                    (self.params, self.cache, self.touched, self.dense_acc,
                     self.embed_acc, loss_v, corr_v) = out
                else:
                    self.params, self.cache, self.touched, loss_v, corr_v = out
                for i, (cursor, _, _, _, _, _) in enumerate(items):
                    pending.append((loss_v, corr_v, b, i))
                    after_step(cursor)

        window_t0 = time.perf_counter()
        try:
            while True:
                if max_steps is not None and self.global_step >= max_steps:
                    break
                if self._stop_requested:
                    break
                items, stream_end, boundary = [], False, None
                cap = block_cap()
                while len(items) < cap:
                    item = pipe.get()
                    if item is None:
                        stream_end = True
                        break
                    if item is WINDOW_BOUNDARY or item is WINDOW_REPLAY:
                        boundary = item
                        break
                    items.append(item)
                if items:
                    run_block(items)
                    if self._mh_want_prefetch:
                        # first block of this window has been dispatched —
                        # the deterministic hoist point for the next
                        # window's allgather + plan join + H2D
                        self._mh_want_prefetch = False
                        self._prefetch_next_window()
                if stream_end:
                    self._stream_done = True
                    break
                if boundary is not None:
                    item = boundary
                    rows_ex = None
                    if self._stager is not None:
                        popped = self._stager.get()
                        window, staged = popped if popped else (None, None)
                    elif self._mh_pending is not None:
                        window, rows_ex, staged = self._mh_pending
                        self._mh_pending = None
                    else:
                        window, staged = self.prefetcher.get_window(), None
                    if window is None:
                        break
                    self._mh_want_prefetch = self._mh_prestage
                    if item is WINDOW_REPLAY:
                        # mid-window resume: the checkpointed occupancy and
                        # controller RNG already reflect this window's insert
                        # plan (the prefetcher emitted plan_spec=None for it)
                        # — only rebuild the multi-host window store and
                        # adopt the shadow-computed buckets (stats were
                        # counted against the already-post-refill state)
                        if self.multihost:
                            rows = exchange_window_rows(
                                self.master, window.uniques, window.rows
                            )
                            self._window_store = WindowRowStore(
                                window.uniques, rows
                            )
                        self._apply_window_stats(window)
                    else:
                        self._apply_refill(window, staged,
                                           rows_exchanged=rows_ex)
                    pipe.notify_refill_applied()
        finally:
            # the pipeline persists across train() calls; close() stops it
            pass
        flush_pending()
        return self.metrics

    # ------------------------------------------------------------------- eval
    def evaluate(self, max_batches: Optional[int] = None, log_fn=print):
        """Sharded eval over the test stream; returns (accuracy, auc).
        Reference tests on rank 0 only (main_no_ddp.py:479-494); see
        make_cached_eval_step for the documented deviation.

        PIPELINED serving path (round-3 verdict item 1 — the round-3 loop
        ran assemble and forward strictly serially per batch):
        - a producer thread runs eval assembly ``pipeline_depth`` batches
          ahead of the consuming forward. Single-host it runs the FULL
          assembly (probe + miss-row master gather + H2D staging — device
          transfers from a thread are the same pattern the train
          AssemblyPipeline has always used); multi-host it runs the
          host-only half (_probe_eval), and the collective-bearing half
          (_stage_eval: row exchange + staging) stays on the main thread in
          batch order so every host's collective sequence is identical.
        - score materialization (the D2H sync) lags one batch: batch i-1's
          accuracy/AUC host work runs while batch i's forward executes and
          batch i+1 assembles. Eval miss rows are thereby prefetched ahead
          of the consuming batch — the eval stream is fully known in
          advance."""
        import queue as queue_mod
        import threading
        from collections import deque

        cfg = self.cfg
        tb = cfg.test_mini_batch_size
        tb_loc = -(-tb // self.ndev)
        total, correct = 0, 0
        auc = StreamingAUC()

        depth = max(1, cfg.pipeline_depth)
        out: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
        stop = threading.Event()

        def produce():
            try:
                for i, batch in enumerate(self.test_dataset.batches()):
                    if max_batches is not None and i >= max_batches:
                        break
                    if stop.is_set():
                        return
                    n = batch.x.shape[0]
                    padded = _pad_batch(batch, tb_loc * self.ndev)
                    probed = self._probe_eval(padded, tb_loc)
                    if self.multihost:
                        item = (n, batch.y, None, probed)
                    else:
                        item = (n, batch.y, self._stage_eval(probed, tb_loc),
                                None)
                    while not stop.is_set():
                        try:
                            out.put(item, timeout=0.1)
                            break
                        except queue_mod.Full:
                            continue
            except BaseException as e:
                out.put(e)
                return
            out.put(None)

        producer = threading.Thread(
            target=produce, daemon=True, name="eval-pipeline"
        )
        producer.start()

        pending: deque = deque()  # (scores_arr, n, y) with lag-1 D2H

        def materialize(entry):
            nonlocal total, correct
            scores_arr, n, y = entry
            if self.multihost:
                # reassemble the globally-sharded scores: local shards +
                # one allgather (process-major order == batch order)
                from jax.experimental import multihost_utils

                local = local_batch_rows(scores_arr)
                scores = np.asarray(
                    multihost_utils.process_allgather(local)
                ).reshape(-1, local.shape[-1])
            else:
                scores = np.asarray(scores_arr)
            scores = scores[:n]
            y = y[:n]
            correct += accuracy_count(scores, y)
            total += n
            auc.update(scores, y)

        try:
            while True:
                item = out.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                n, y, inputs, probed = item
                if inputs is None:
                    inputs = self._stage_eval(probed, tb_loc)
                self.cache, scores_arr = self.eval_step(
                    self.params, self.cache, *inputs
                )
                pending.append((scores_arr, n, y))
                if len(pending) > 1:
                    materialize(pending.popleft())
            while pending:
                materialize(pending.popleft())
        finally:
            stop.set()
            producer.join(timeout=30)
        acc = correct / max(1, total)
        auc_v = auc.result()
        log_fn(f"Test accuracy = {100.0 * acc:.4f}%  AUC = {auc_v:.5f}")
        ptr = self.metrics.per_table_hit_rates
        if ptr is not None:
            # compact summary on the console; the full [T] vector goes to
            # the structured log below
            log_fn(
                f"Per-table train hit rates: min {float(ptr.min()):.4f} "
                f"mean {float(ptr.mean()):.4f} max {float(ptr.max()):.4f}"
            )
        self._log_metrics(
            "eval",
            {
                "accuracy": acc,
                "auc": None if np.isnan(auc_v) else float(auc_v),
                "eval_hit_rate": self.metrics.eval_hit_rate,
                "per_table_hit_rates": (
                    None if ptr is None else [round(float(v), 4) for v in ptr]
                ),
                "examples": total,
            },
        )
        return acc, auc_v

    # ------------------------------------------------------------ checkpoint
    def _save_master(self, file_path: str) -> None:
        """Master-table leg of the checkpoint. Default 'dirty' saves only
        (init spec + rows ever written back) — the exact delta, since
        masters mutate solely via eviction writeback (config
        checkpoint_masters; round-3 verdict item 4). Masters without dirty
        tracking (VirtualMasterTables keeps its own O(dirty) overlay
        format) fall back to their full save."""
        if self.cfg.checkpoint_masters == "dirty" and hasattr(
            self.master, "save_dirty"
        ):
            self.master.save_dirty(file_path, init_token=self._init_token())
        else:
            self.master.save(file_path)

    def _init_token(self) -> int:
        """Stable digest of everything the procedural master re-init depends
        on (seed + init mode); guards a dirty-checkpoint load against a
        config whose re-derived base tables would differ."""
        import zlib

        return zlib.crc32(
            f"{self.cfg.numpy_rand_seed}:{self.cfg.master_init}".encode()
        )

    def _load_master(self, file_path: str) -> None:
        try:
            self.master.load(file_path, init_token=self._init_token())
        except TypeError:
            self.master.load(file_path)  # loaders without dirty support

    def _join_ckpt_writer(self) -> None:
        """Wait for an outstanding async checkpoint writer and re-raise its
        error (save/load/close are the join points)."""
        th = getattr(self, "_ckpt_thread", None)
        if th is not None:
            th.join()
            self._ckpt_thread = None
            err = self._ckpt_error
            self._ckpt_error = None
            if err is not None:
                raise RuntimeError(
                    f"async checkpoint write failed: {err!r}"
                ) from err

    def save_checkpoint(self, path: str) -> None:
        """Full-state checkpoint (capability upgrade; the reference parses
        --save-model but never implements it, main_no_ddp.py:111-112).

        Structured as SNAPSHOT (on the train thread: eviction flush, device
        D2H, host-side copies — everything that must see a consistent
        instant) then WRITE (pure file serialization over the snapshot).
        ``--checkpoint-async`` runs the write phase on a background thread;
        the next save/load/close joins it."""
        self._join_ckpt_writer()
        os.makedirs(path, exist_ok=True)
        # in-flight eviction writebacks must land in the masters first
        if not self.eviction_manager.flush(timeout=self.cfg.eviction_fifo_timeout):
            raise RuntimeError(
                "eviction writeback flush timed out; checkpoint would miss "
                "in-flight evicted rows (raise --eviction-fifo-timeout)"
            )
        # ---- snapshot phase ----
        # per-replica state is saved IN FULL: replicas legitimately diverge
        # between aggregations (local sparse SGD), and `touched` carries the
        # pending-aggregation set — collapsing either would make a resumed
        # run diverge from the uninterrupted one. Multi-host: every host
        # saves its owned master shard + its local cache/touched block;
        # host 0 additionally saves the replica-identical dense params,
        # occupancy, and meta.
        tag = f".h{jax.process_index()}" if self.multihost else ""
        writes: list = []

        def _npy(name, arr):
            writes.append((np.save, os.path.join(path, name), arr))

        def _npz(name, payload):
            writes.append((
                lambda p, d: np.savez(p, **d), os.path.join(path, name),
                payload,
            ))

        _npy(f"cache{tag}.npy", np.concatenate(
            [np.asarray(s.data) for s in self.cache.addressable_shards]))
        _npy(f"touched{tag}.npy", np.concatenate(
            [np.asarray(s.data) for s in self.touched.addressable_shards]))
        if self._adagrad:
            # optimizer state is per-replica like cache/touched (row-wise
            # accumulators) + replica-identical dense accumulators
            _npy(f"embed_acc{tag}.npy", np.concatenate(
                [np.asarray(s.data)
                 for s in self.embed_acc.addressable_shards]))
        if self._acc_master is not None:
            # master-resident accumulator support (nonzero rows == ids ever
            # evicted; the eviction flush above made it consistent). Copies
            # taken at snapshot time — payload() fancy-indexes. Multihost:
            # per-host owned support, tagged like cache/touched.
            _npz(f"acc_store{tag}.npz", self._acc_master.payload())
        master_file = os.path.join(
            path,
            f"master.h{jax.process_index()}.npz" if self.multihost
            else "master.npz",
        )
        if (self.cfg.checkpoint_masters == "dirty"
                and hasattr(self.master, "dirty_payload")):
            # snapshot the dirty rows NOW (fancy-index copies) — training
            # may resume writebacks while the writer serializes
            _npz(os.path.basename(master_file),
                 self.master.dirty_payload(self._init_token()))
        else:
            # full/virtual dumps have no snapshot API; write synchronously
            self._save_master(master_file)
        if not (self.multihost and jax.process_index() != 0):
            params = step_lib.unreplicate(self.params)
            leaves, _ = jax.tree_util.tree_flatten(params)
            _npz("dense_params.npz",
                 {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
            if self._adagrad:
                acc_leaves, _ = jax.tree_util.tree_flatten(
                    step_lib.unreplicate(self.dense_acc)
                )
                _npz("dense_acc.npz",
                     {f"leaf_{i}": np.asarray(l)
                      for i, l in enumerate(acc_leaves)})
            # state_dict returns LIVE occupancy arrays — copy at snapshot
            _npz("occupancy.npz",
                 {k: np.copy(v)
                  for k, v in self.controller.state_dict().items()})
            meta = {
                # format history: v2 = round-2 layout (full local cache
                # block + touched mask, unversioned); v3 adds this version
                # field. Bump on any layout change so load_checkpoint can
                # fail with a clear message instead of an incidental
                # FileNotFoundError/reshape.
                "format_version": CHECKPOINT_FORMAT_VERSION,
                "global_step": self.global_step,
                "rng_state": self.controller.rng.bit_generator.state,
                # data cursor: resume continues the SAME stream alignment
                "cursor": self._cursor,
            }

            def _meta(p, m):
                with open(p, "wb") as f:
                    pickle.dump(m, f)

            writes.append((_meta, os.path.join(path, "meta.pkl"), meta))

        # ---- write phase ----
        def run_writes():
            try:
                for fn, p, data in writes:
                    fn(p, data)
            except BaseException as e:  # surfaced at the next join point
                self._ckpt_error = e

        if self.cfg.checkpoint_async:
            self._ckpt_error = None
            # NON-daemon: a process exit that bypasses close() must block
            # on the writer instead of killing it mid-np.savez and leaving
            # a silently truncated checkpoint on disk
            self._ckpt_thread = threading.Thread(
                target=run_writes, name="ckpt-writer", daemon=False
            )
            self._ckpt_thread.start()
        else:
            run_writes()
            err = self._ckpt_error
            self._ckpt_error = None
            if err is not None:
                raise err
            if self.multihost:
                # shared-dir visibility barrier: a host must not be able to
                # return from save (and possibly load_checkpoint the same
                # dir) before EVERY host's files exist. Synchronous saves
                # only — an async writer finishes off the main thread, where
                # no collective may run; async cross-host resume needs
                # external completion coordination (each host joins only
                # its OWN writer).
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("cdlrm_ckpt_save")

    def load_checkpoint(self, path: str) -> None:
        # an outstanding async writer may still be producing the files
        self._join_ckpt_writer()
        # meta first: an incompatible-format checkpoint must fail with a
        # clear error, not an incidental FileNotFoundError mid-restore
        # (round-2 advisor finding)
        with open(os.path.join(path, "meta.pkl"), "rb") as f:
            meta = pickle.load(f)
        fmt = meta.get("format_version", 2 if "cursor" in meta else 1)
        if fmt not in (2, CHECKPOINT_FORMAT_VERSION):
            raise ValueError(
                f"incompatible checkpoint format v{fmt} at {path!r} (this "
                f"build reads v2-v{CHECKPOINT_FORMAT_VERSION}); re-save with "
                "a matching build"
            )
        params = step_lib.unreplicate(self.params)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        with np.load(os.path.join(path, "dense_params.npz")) as data:
            leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        self.params = step_lib.replicate_for_mesh(params, self.mesh)
        # cache/touched were saved as this host's local [n_local*R, D] block
        # (per-replica state in full — see save_checkpoint); restore mirrors
        # the constructor's put_global exactly: local portion + global shape.
        tag = f".h{jax.process_index()}" if self.multihost else ""
        cache0 = np.load(os.path.join(path, f"cache{tag}.npy"))
        rows_per_dev = cache0.shape[0] // self.n_local
        self.cache = put_global(
            cache0,
            self._shardings["lead"],
            (self.ndev * rows_per_dev, cache0.shape[1]),
        )
        touched0 = np.load(os.path.join(path, f"touched{tag}.npy"))
        self.touched = put_global(
            touched0,
            self._shardings["lead"],
            (self.ndev * rows_per_dev,),
        )
        acc_path = os.path.join(path, f"embed_acc{tag}.npy")
        if (not self._adagrad and os.path.exists(acc_path)
                and not self.cfg.inference_only):
            # forward-only serving never reads the accumulators, so
            # --inference-only may load an adagrad-trained checkpoint
            # under any optimizer setting
            raise ValueError(
                f"{path!r} carries AdaGrad optimizer state but this run is "
                "optimizer='sgd'; resuming would silently drop the "
                "accumulators — pass --optimizer adagrad (or "
                "--inference-only for serving)"
            )
        if self._adagrad:
            if not os.path.exists(acc_path):
                raise ValueError(
                    f"optimizer='adagrad' but {path!r} carries no optimizer "
                    "state (saved by an SGD run?); resume with the matching "
                    "optimizer"
                )
            self.embed_acc = put_global(
                np.load(acc_path),
                self._shardings["lead"],
                (self.ndev * rows_per_dev,),
            )
            acc_leaves, acc_treedef = jax.tree_util.tree_flatten(
                step_lib.unreplicate(self.dense_acc)
            )
            with np.load(os.path.join(path, "dense_acc.npz")) as data:
                acc_leaves = [data[f"leaf_{i}"]
                              for i in range(len(acc_leaves))]
            self.dense_acc = step_lib.replicate_for_mesh(
                jax.tree_util.tree_unflatten(acc_treedef, acc_leaves),
                self.mesh,
            )
        if self._acc_master is not None:
            store_tag = (
                f".h{jax.process_index()}" if self.multihost else ""
            )
            store_path = os.path.join(path, f"acc_store{store_tag}.npz")
            if not os.path.exists(store_path):
                raise ValueError(
                    f"adagrad_master_state set but {path!r} carries no "
                    "accumulator store (saved without the flag?); resume "
                    "with the matching setting"
                )
            with np.load(store_path) as data:
                self._acc_master.load_payload(data)
        with np.load(os.path.join(path, "occupancy.npz")) as data:
            self.controller.load_state_dict(dict(data))
        if self.multihost:
            self._load_master(
                os.path.join(path, f"master.h{jax.process_index()}.npz")
            )
        else:
            self._load_master(os.path.join(path, "master.npz"))
        self.global_step = meta["global_step"]
        self.controller.rng.bit_generator.state = meta["rng_state"]
        if self._pipeline_started:
            raise RuntimeError(
                "load_checkpoint after training started: the stream cursor "
                "cannot be rewound on a running pipeline — load into a fresh "
                "trainer"
            )
        self._cursor = tuple(meta.get("cursor", (0, 0)))

    # ---------------------------------------------------------------- cleanup
    def close(self) -> None:
        # join the async checkpoint writer FIRST (its error must surface),
        # but never let that raise skip the thread/file shutdown below
        try:
            self._join_ckpt_writer()
        finally:
            if self._metrics_fp is not None:
                self._metrics_fp.close()
                self._metrics_fp = None
            if self._pipeline_started:
                if self._pipe is not None:
                    self._pipe.stop()
                if self._stager is not None:
                    self._stager.stop()
                if self.prefetcher is not None:
                    self.prefetcher.stop()
                self.eviction_fifo.put(None)


def _pad_batch(batch: Batch, to_size: int) -> Batch:
    n = batch.x.shape[0]
    if n == to_size:
        return batch
    pad = to_size - n
    x = np.concatenate([batch.x, np.zeros((pad,) + batch.x.shape[1:], batch.x.dtype)])
    ls_i = np.concatenate(
        [batch.ls_i, np.zeros(batch.ls_i.shape[:1] + (pad,) + batch.ls_i.shape[2:],
                              batch.ls_i.dtype)], axis=1
    )
    mask = batch.ls_mask
    if mask is not None:
        mask = np.concatenate(
            [mask, np.zeros(mask.shape[:1] + (pad,) + mask.shape[2:], mask.dtype)],
            axis=1,
        )
    y = np.concatenate([batch.y, np.zeros((pad,) + batch.y.shape[1:], batch.y.dtype)])
    return Batch(x, ls_i, mask, y)
