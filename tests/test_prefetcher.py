"""Prefetch pipeline: window dedup correctness, backpressure, eviction
writeback (reference cache_manager.py semantics)."""

import queue
import time

import numpy as np

from cdlrm_tpu.cache.master import MasterTables
from cdlrm_tpu.cache.prefetcher import EvictionManager, LookaheadPrefetcher


def make_stream(batches):
    def fn(skip=0):
        return iter(batches[skip:])

    return fn


def test_window_unique_and_rows(rng):
    master = MasterTables([100, 40], 4, rng)
    b1 = np.array([[1, 2, 2], [0, 1, 2]])
    b2 = np.array([[2, 3, 4], [2, 2, 2]])
    pf = LookaheadPrefetcher(make_stream([b1, b2]), master, lookahead=2,
                             batch_fifo_size=4, cache_workers=2)
    pf.start()
    w = pf.get_window()
    assert w is not None
    assert w.num_batches == 2
    np.testing.assert_array_equal(w.uniques[0], [1, 2, 3, 4])
    np.testing.assert_array_equal(w.uniques[1], [0, 1, 2])
    np.testing.assert_allclose(w.rows[0], master.tables[0][[1, 2, 3, 4]])
    assert pf.get_window() is None  # stream exhausted
    pf.join(timeout=5)


def test_window_multihot_masked(rng):
    master = MasterTables([100], 4, rng)
    ls_i = np.array([[[5, 7, 0], [9, 0, 0]]])  # [T=1, B=2, P=3]
    mask = np.array([[[True, True, False], [True, False, False]]])
    pf = LookaheadPrefetcher(make_stream([(ls_i, mask)]), master, lookahead=1)
    pf.start()
    w = pf.get_window()
    np.testing.assert_array_equal(w.uniques[0], [5, 7, 9])  # masked 0s excluded
    pf.join(timeout=5)


def test_partial_final_window(rng):
    master = MasterTables([100], 4, rng)
    batches = [np.array([[i]]) for i in range(5)]
    pf = LookaheadPrefetcher(make_stream(batches), master, lookahead=2)
    pf.start()
    sizes = []
    while True:
        w = pf.get_window()
        if w is None:
            break
        sizes.append(w.num_batches)
    assert sizes == [2, 2, 1]
    pf.join(timeout=5)


def test_backpressure(rng):
    """put() must block once the fifo is full (reference Manager-queue
    semantics, main_no_ddp.py:624)."""
    master = MasterTables([100], 4, rng)
    batches = [np.array([[i]]) for i in range(10)]
    pf = LookaheadPrefetcher(make_stream(batches), master, lookahead=1,
                             batch_fifo_size=2)
    pf.start()
    time.sleep(0.5)
    # fifo bounded: at most 2 queued even though 10 windows exist
    assert pf.fifo.qsize() <= 2
    drained = 0
    while pf.get_window() is not None:
        drained += 1
    assert drained == 10
    pf.join(timeout=5)


def test_eviction_manager_writeback_and_average(rng):
    master = MasterTables([10, 10], 4, rng)
    fifo = queue.Queue()
    em = EvictionManager(master, fifo, average_on_writeback=False, timeout=2)
    em.start()
    rows = np.arange(8, dtype=np.float32).reshape(2, 4)
    fifo.put((np.array([0, 1]), np.array([3, 7]), rows))
    fifo.put(None)
    em.join(timeout=5)
    np.testing.assert_allclose(master.tables[0][3], rows[0])
    np.testing.assert_allclose(master.tables[1][7], rows[1])
    assert em.rows_written == 2

    # averaging mode
    master2 = MasterTables([10], 4, rng)
    before = master2.tables[0][2].copy()
    fifo2 = queue.Queue()
    em2 = EvictionManager(master2, fifo2, average_on_writeback=True, timeout=2)
    em2.start()
    fifo2.put((np.array([0]), np.array([2]), np.zeros((1, 4), np.float32)))
    fifo2.put(None)
    em2.join(timeout=5)
    np.testing.assert_allclose(master2.tables[0][2], before / 2)


def test_eviction_manager_timeout_exit(rng):
    master = MasterTables([10], 4, rng)
    em = EvictionManager(master, queue.Queue(), timeout=0.2)
    em.start()
    em.join(timeout=5)
    assert not em.is_alive()


def test_prefetcher_error_propagates(rng):
    master = MasterTables([10], 4, rng)

    def bad_stream(skip=0):
        def gen():
            yield np.array([[50]])  # out of range -> gather raises

        return gen()

    pf = LookaheadPrefetcher(bad_stream, master, lookahead=1)
    pf.start()
    try:
        pf.get_window()
        raised = False
    except IndexError:
        raised = True
    assert raised
    pf.join(timeout=5)


def test_process_backend_mmap(rng, tmp_path):
    """Process-pool backend over mmap-backed master tables (reference-style
    mp pool, cache_manager.py:77-100)."""
    master = MasterTables([100, 40], 4, rng, mmap_dir=str(tmp_path))
    b1 = np.array([[1, 2, 2], [0, 1, 2]])
    b2 = np.array([[2, 3, 4], [2, 2, 2]])
    pf = LookaheadPrefetcher(make_stream([b1, b2]), master, lookahead=2,
                             cache_workers=2, backend="process",
                             # fork-inherited pin counter must survive the
                             # executor's initargs plumbing (pin_cores path)
                             worker_pin_base=0)
    pf.start()
    w = pf.get_window(timeout=120)
    np.testing.assert_array_equal(w.uniques[0], [1, 2, 3, 4])
    np.testing.assert_allclose(w.rows[0], np.asarray(master.tables[0][[1, 2, 3, 4]]))
    assert pf.get_window(timeout=120) is None
    pf.join(timeout=30)


def test_process_backend_requires_mmap(rng):
    master = MasterTables([10], 4, rng)  # in-RAM
    try:
        LookaheadPrefetcher(make_stream([]), master, lookahead=1, backend="process")
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_eviction_flush_barrier(rng):
    """flush() returns only after all prior writebacks (including deferred
    device-fetch thunks) have landed in the masters."""
    import queue as queue_mod
    import time

    from cdlrm_tpu.cache.master import MasterTables
    from cdlrm_tpu.cache.prefetcher import EvictionManager

    master = MasterTables([100], 4, np.random.default_rng(0))
    fifo = queue_mod.Queue()
    mgr = EvictionManager(master, fifo, timeout=30)
    mgr.start()
    rows = np.ones((5, 4), np.float32) * 7

    def slow_fetch():
        time.sleep(0.2)
        return rows

    fifo.put((np.zeros(5, np.int32), np.arange(5, dtype=np.int64), slow_fetch))
    assert mgr.flush(timeout=10)
    assert np.array_equal(master.tables[0][:5], rows)
    assert mgr.rows_written == 5
    fifo.put(None)


def test_no_extra_data_pass_at_long_lookahead():
    """The round-2 design re-read the whole dataset once more per window to
    negotiate staging buckets at long-lookahead configs (above the retention
    budget). The shadow planner computes plans + stats while the window
    streams, so a full training run must read the stream EXACTLY twice
    (trainer assembly pass + prefetcher cache pass, the reference's
    train_ld/cache_ld pair — dlrm_data_pytorch.py:465-483), regardless of
    lookahead or the stats features enabled (scan blocks + auto dedup +
    hot tier all on here)."""
    import numpy as np

    from cdlrm_tpu.config import Config
    from cdlrm_tpu.data.synthetic import Batch
    from cdlrm_tpu.train.trainer import CachedDlrmTrainer

    ln_emb = np.array([300, 200, 400])
    counts = {"iterators": 0, "batches": 0}

    class CountingDataset:
        m_den = 13
        ln_emb_ = ln_emb

        def __init__(self, num_batches=24, batch=32):
            self.ln_emb = ln_emb
            self.num_batches, self.batch = num_batches, batch

        def __len__(self):
            return self.num_batches

        def batches(self):
            counts["iterators"] += 1
            rng = np.random.default_rng(0)
            for _ in range(self.num_batches):
                counts["batches"] += 1
                x = rng.random((self.batch, 13)).astype(np.float32)
                ls = np.stack([rng.integers(0, n, self.batch) for n in ln_emb])
                y = (x[:, 0] > 0.5).astype(np.float32)[:, None]
                yield Batch(x, ls, None, y)

    cfg = Config(
        arch_sparse_feature_size=8, arch_mlp_bot="13-16-8", arch_mlp_top="8-1",
        mini_batch_size=32, world_size=4, cache_size=64, num_ways=4,
        loss_function="bce", lookahead=12,  # long window, 2 windows total
        table_agg_freq=6, print_freq=1000, scan_steps=3,
        dedup_lookups="auto", hot_tier_rows=16,
    )
    cfg.finalize(ln_emb=ln_emb)
    ds = CountingDataset()
    tr = CachedDlrmTrainer(cfg, ds)
    # peek in the trainer ctor (pooled-width inference) costs one iterator +
    # one batch; discount it
    peek_iters, peek_batches = counts["iterators"], counts["batches"]
    tr.train(max_steps=24, log_fn=lambda s: None)
    tr.close()
    assert tr.global_step == 24
    assert counts["iterators"] - peek_iters == 2, counts  # trainer + prefetcher
    assert counts["batches"] - peek_batches <= 2 * ds.num_batches, counts


def test_hot_selection_and_cold_counts_exact(rng):
    """WindowData.hot_slots must be sorted POST-plan resident rows, and
    WindowStats.worst_cold must be an EXACT upper bound on every
    (replica, batch) slice's cold-lookup count for that hot set — the
    device cold-compaction bucket silently truncates past it, so this is
    the no-silent-truncation guarantee (StepConfig.hot_rows doc)."""
    from cdlrm_tpu.cache.geometry import CacheGeometry
    from cdlrm_tpu.cache.host_cache import HostCacheController

    ln_emb = (200, 150)
    geo = CacheGeometry.build(ln_emb, 4, 32, 2, 64)
    master = MasterTables(ln_emb, 4, np.random.default_rng(0))
    shadow = HostCacheController(
        geo, seed=3, ln_emb=np.asarray(ln_emb), slot_map=True
    )
    ndev, b_loc, h = 2, 8, 8
    batches = [
        np.stack([
            np.concatenate([rng.integers(0, 4, 8), rng.integers(0, n, 8)])
            for n in ln_emb
        ])
        for _ in range(6)
    ]
    pf = LookaheadPrefetcher(
        make_stream(batches), master, lookahead=6,
        shadow=shadow.clone(), stats_spec=(ndev, b_loc, True, h),
    )
    pf.start()
    w = pf.get_window()
    pf.stop()
    assert w.plan_spec is not None and w.stats is not None
    hot = w.hot_slots
    assert hot is not None and hot.size <= h - 1
    assert (np.sort(hot) == hot).all()

    # replay the plan on a fresh controller, then brute-force residency
    ctl = HostCacheController(geo, seed=3, ln_emb=np.asarray(ln_emb),
                              slot_map=True)
    ctl.apply_plan_spec(w.plan_spec)
    for s in hot:
        # every hot slot is a resident (ways*sets region) row post-plan
        t = int(np.searchsorted(geo.table_offsets, s, side="right") - 1)
        local = int(s) - int(geo.table_offsets[t])
        assert local < geo.ways * int(geo.sets[t])
        way, set_idx = divmod(local, int(geo.sets[t]))
        assert ctl.occupancy[t][set_idx, way] >= 0

    worst_cold = 0
    hot_set = set(hot.tolist())
    for ls in batches:
        for r in range(ndev):
            sl = ls[:, r * b_loc:(r + 1) * b_loc]
            cold = 0
            for t in range(2):
                slots = ctl.resident_slots(t, sl[t])
                cold += int(
                    sum(1 for s in slots if s < 0 or int(s) not in hot_set)
                )
            worst_cold = max(worst_cold, cold)
    assert w.stats.worst_cold == worst_cold


def test_pin_cores_layout(monkeypatch):
    """cfg.pin_cores wires the reference's taskset layout end-to-end
    (main_no_ddp.py:634-635, cache_manager.py:71,79): main thread at
    main_start_core, prefetcher +1, eviction +2, cache worker p at +3+p
    (mod cpu count). Recorded by intercepting the one syscall wrapper all
    pin sites share."""
    import os
    import threading

    from tests.test_trainer_e2e import LearnableDataset, make_cfg
    from cdlrm_tpu.train.trainer import CachedDlrmTrainer

    calls = []  # (thread_name, cores) — GIL-append is thread-safe

    def record(pid, cores):
        assert pid == 0  # every pin targets the CALLING thread
        calls.append((threading.current_thread().name, frozenset(cores)))

    monkeypatch.setattr(os, "sched_setaffinity", record, raising=False)
    cfg = make_cfg(pin_cores=True, main_start_core=5, cache_workers=2)
    ds = LearnableDataset(cfg.ln_emb, num_batches=8)
    tr = CachedDlrmTrainer(cfg, ds, ds)
    tr.train(max_steps=8, log_fn=lambda s: None)
    tr.close()

    ncpu = os.cpu_count()
    by_thread = {name: cores for name, cores in calls}
    assert by_thread["MainThread"] == {5 % ncpu}
    assert by_thread["lookahead-prefetcher"] == {6 % ncpu}
    assert by_thread["eviction-manager"] == {7 % ncpu}
    worker_cores = sorted(
        min(c) for n, c in calls
        if n not in ("MainThread", "lookahead-prefetcher", "eviction-manager")
    )
    assert worker_cores == [8 % ncpu, 9 % ncpu]


def test_pin_cores_default_off(monkeypatch):
    """Without pin_cores no affinity syscall is ever issued."""
    import os

    from tests.test_trainer_e2e import LearnableDataset, make_cfg
    from cdlrm_tpu.train.trainer import CachedDlrmTrainer

    def boom(pid, cores):  # pragma: no cover - failure path
        raise AssertionError("sched_setaffinity called with pin_cores off")

    monkeypatch.setattr(os, "sched_setaffinity", boom, raising=False)
    cfg = make_cfg()
    ds = LearnableDataset(cfg.ln_emb, num_batches=8)
    tr = CachedDlrmTrainer(cfg, ds, ds)
    tr.train(max_steps=8, log_fn=lambda s: None)
    tr.close()
