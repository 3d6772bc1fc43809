"""Criteo pipeline: offline preprocessing artifacts, loaders, and the
binary-vs-npz lockstep equivalence test (the reference's _test_bin pattern,
/root/reference/data_loader_terabyte.py:297-357)."""

import os

import numpy as np
import pytest

from cdlrm_tpu.data.criteo import (
    SPA_FEA,
    CriteoBinDataset,
    CriteoInMemoryDataset,
    CriteoStreamingDataset,
    numpy_to_binary,
    transform_batch,
)
from cdlrm_tpu.data.preprocess import get_criteo_ad_data

DAYS = 3
LINES = 120


def write_raw_kaggle(path, n=LINES, seed=0):
    """Fabricate a raw Criteo-format TSV: target, 13 ints, 26 hex cats;
    sprinkle missing fields."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            target = int(rng.random() < 0.3)
            dense = [str(int(v)) for v in rng.integers(-2, 100, 13)]
            cats = [format(int(v), "x") for v in rng.integers(0, 5000, 26)]
            if i % 7 == 0:
                dense[3] = ""  # missing -> 0
                cats[5] = ""
            f.write("\t".join([str(target)] + dense + cats) + "\n")


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    d = tmp_path_factory.mktemp("criteo")
    raw = str(d / "train.txt")
    write_raw_kaggle(raw)
    out = get_criteo_ad_data(
        raw, "kaggle_processed", days=DAYS, criteo_kaggle=True, memory_map=True
    )
    # also produce the concatenated npz for the in-memory path
    pro = get_criteo_ad_data(
        raw, "kaggle_processed", days=DAYS, criteo_kaggle=True, memory_map=False
    )
    return d, raw, out, pro


def test_artifacts_exist(prepared):
    d, raw, prefix, pro = prepared
    assert os.path.exists(str(d / "train_day_count.npz"))
    assert os.path.exists(str(d / "train_fea_count.npz"))
    for i in range(DAYS):
        assert os.path.exists(f"{prefix}_{i}_reordered.npz")
    assert os.path.exists(pro)
    with np.load(str(d / "train_day_count.npz")) as data:
        assert int(np.sum(data["total_per_file"])) == LINES


def test_counts_and_remap(prepared):
    d, raw, prefix, pro = prepared
    with np.load(str(d / "train_fea_count.npz")) as data:
        counts = data["counts"]
    assert counts.shape == (26,)
    with np.load(pro) as data:
        x_cat, x_int, y = data["X_cat"], data["X_int"], data["y"]
        assert (data["counts"] == counts).all()
    # remapped ids are dense in [0, counts)
    for j in range(26):
        assert x_cat[:, j].min() >= 0
        assert x_cat[:, j].max() < counts[j]
    # dense negatives clamped
    assert x_int.min() >= 0
    assert set(np.unique(y)) <= {0, 1}


def test_fyr_preserves_multiset(prepared):
    """Reordering must be a permutation of the processed data."""
    d, raw, prefix, pro = prepared
    orig, reord = [], []
    for i in range(DAYS):
        with np.load(f"{prefix}_{i}_processed.npz") as data:
            orig.append(np.concatenate(
                [data["y"].reshape(-1, 1), data["X_int"], data["X_cat"]], axis=1))
        with np.load(f"{prefix}_{i}_reordered.npz") as data:
            reord.append(np.concatenate(
                [data["y"].reshape(-1, 1), data["X_int"], data["X_cat"]], axis=1))
    a = np.concatenate(orig)
    b = np.concatenate(reord)
    # last day preserved in place (holds the test/val split)
    np.testing.assert_array_equal(orig[-1], reord[-1])
    # global multiset equality via lexicographic sort
    np.testing.assert_array_equal(
        a[np.lexsort(a.T[::-1])], b[np.lexsort(b.T[::-1])]
    )
    # and it actually shuffled the train days
    assert not np.array_equal(a, b)


def test_streaming_loader_shapes_and_stitching(prepared):
    d, raw, prefix, pro = prepared
    bs = 32  # does not divide day size (40) -> forces cross-day stitching
    ds = CriteoStreamingDataset(prefix, range(DAYS - 1), bs, split="train")
    batches = list(ds.batches())
    total = sum(b.x.shape[0] for b in batches)
    assert total == 80  # days 0+1
    assert all(b.x.shape == (bs, 13) for b in batches[:-1])
    b0 = batches[0]
    assert b0.ls_i.shape == (26, bs) and b0.ls_mask is None
    assert b0.y.shape == (bs, 1)
    # log1p transform of non-negative ints
    assert (b0.x >= 0).all()
    # second pass identical (restartable for the prefetcher)
    again = list(ds.batches())
    np.testing.assert_array_equal(batches[0].ls_i, again[0].ls_i)


def test_streaming_test_val_halves(prepared):
    d, raw, prefix, pro = prepared
    test = list(CriteoStreamingDataset(prefix, [DAYS - 1], 8, split="test").batches())
    val = list(CriteoStreamingDataset(prefix, [DAYS - 1], 8, split="val").batches())
    n_test = sum(b.x.shape[0] for b in test)
    n_val = sum(b.x.shape[0] for b in val)
    assert n_test == 20 and n_val == 20  # 40-sample day halved
    # disjoint halves: test is the first half, val the second
    with np.load(f"{prefix}_{DAYS-1}_reordered.npz") as data:
        y = data["y"]
    np.testing.assert_array_equal(
        np.concatenate([b.y.ravel() for b in test]), y[:20].astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.concatenate([b.y.ravel() for b in val]), y[20:].astype(np.float32)
    )


def test_in_memory_splits(prepared):
    d, raw, prefix, pro = prepared
    day_count = str(d / "train_day_count.npz")
    tr = CriteoInMemoryDataset(pro, 16, split="train", day_count_file=day_count)
    te = CriteoInMemoryDataset(pro, 16, split="test", day_count_file=day_count)
    va = CriteoInMemoryDataset(pro, 16, split="val", day_count_file=day_count)
    assert len(tr.indices) == 80
    assert len(te.indices) + len(va.indices) == 40
    assert set(tr.indices) | set(te.indices) | set(va.indices) == set(range(120))
    b = next(iter(tr.batches()))
    assert b.x.shape == (16, 13) and b.ls_i.shape == (26, 16)


def test_max_ind_range_modulo(prepared):
    d, raw, prefix, pro = prepared
    ds = CriteoStreamingDataset(prefix, [0], 16, split="train", max_ind_range=7)
    for b in ds.batches():
        assert b.ls_i.max() < 7


def test_bin_loader_equivalence(prepared, tmp_path):
    """Lockstep equality between the binary loader and the streaming loader
    over the same reordered files (reference _test_bin,
    data_loader_terabyte.py:297-357)."""
    d, raw, prefix, pro = prepared
    train_files = [f"{prefix}_{i}_reordered.npz" for i in range(DAYS - 1)]
    bin_path = str(tmp_path / "train_data.bin")
    numpy_to_binary(train_files, bin_path, split="train")
    counts_file = str(d / "train_fea_count.npz")
    bs = 16
    bin_ds = CriteoBinDataset(bin_path, counts_file, batch_size=bs)
    stream_ds = CriteoStreamingDataset(prefix, range(DAYS - 1), bs, split="train")
    n_checked = 0
    for old, new in zip(stream_ds.batches(), bin_ds.batches()):
        np.testing.assert_allclose(old.x, new.x, rtol=1e-6)
        np.testing.assert_array_equal(old.ls_i, new.ls_i)
        np.testing.assert_array_equal(old.y, new.y)
        n_checked += 1
    assert n_checked == len(bin_ds) == 5  # 80 samples / 16

    # test split = first half of last day
    test_bin = str(tmp_path / "test_data.bin")
    numpy_to_binary([f"{prefix}_{DAYS-1}_reordered.npz"], test_bin, split="test")
    bin_test = CriteoBinDataset(test_bin, counts_file, batch_size=10)
    stream_test = CriteoStreamingDataset(prefix, [DAYS - 1], 10, split="test")
    for old, new in zip(stream_test.batches(), bin_test.batches()):
        np.testing.assert_array_equal(old.ls_i, new.ls_i)


def test_index_stream_matches_batches(prepared, tmp_path):
    """index_batches (the prefetcher's index-only second pass, round-3
    verdict item 6) must yield EXACTLY batch.ls_i of batches() for every
    loader — same batch boundaries, stitching, shuffle order, skip unit,
    and max_ind_range modulo. A drifted index stream would silently desync
    refill windows from the train stream."""
    d, raw, prefix, pro = prepared
    counts_file = str(d / "train_fea_count.npz")
    bin_path = str(tmp_path / "train_data.bin")
    numpy_to_binary(
        [f"{prefix}_{i}_reordered.npz" for i in range(DAYS - 1)],
        bin_path, split="train",
    )
    day_count = str(d / "train_day_count.npz")

    datasets = [
        # bs=32 does not divide day size 40 -> cross-day carry exercised
        CriteoStreamingDataset(prefix, range(DAYS - 1), 32, split="train"),
        CriteoStreamingDataset(prefix, range(DAYS - 1), 16, split="train",
                               max_ind_range=100, drop_last=True),
        CriteoInMemoryDataset(pro, 16, split="train", day_count_file=day_count),
        CriteoBinDataset(bin_path, counts_file, batch_size=16,
                         shuffle=True, seed=7),
        CriteoBinDataset(bin_path, counts_file, batch_size=16,
                         max_ind_range=64),
    ]
    for ds in datasets:
        for skip in (0, 2):
            full = list(ds.batches(skip=skip))
            idx = list(ds.index_batches(skip=skip))
            assert len(full) == len(idx), type(ds).__name__
            for b, ls in zip(full, idx):
                assert ls.dtype == np.int64
                np.testing.assert_array_equal(b.ls_i, ls)


def test_trainer_cache_stream_uses_index_mode(prepared):
    """The trainer's _cache_stream must route through index_batches when the
    dataset exposes it, preserving the drop-last rule."""
    from unittest import mock

    from cdlrm_tpu.config import Config
    from cdlrm_tpu.train.trainer import CachedDlrmTrainer

    d, raw, prefix, pro = prepared
    train = CriteoStreamingDataset(prefix, range(DAYS - 1), 32, split="train")
    cfg = Config(
        arch_sparse_feature_size=8, arch_mlp_bot="13-16-8", arch_mlp_top="8-1",
        mini_batch_size=32, world_size=8, cache_size=32, num_ways=2,
        loss_function="bce", lookahead=2,
    )
    cfg.finalize(ln_emb=train.ln_emb, m_den=train.m_den)
    trainer = CachedDlrmTrainer(cfg, train)
    try:
        with mock.patch.object(
            train, "index_batches", wraps=train.index_batches
        ) as spy:
            got = list(trainer._cache_stream())
        assert spy.called, "cache stream must take the index-only path"
        want = [b.ls_i for b in train.batches() if b.x.shape[0] == 32]
        assert len(got) == len(want)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
    finally:
        trainer.close()


def test_sub_sample_rate(tmp_path):
    raw = str(tmp_path / "train.txt")
    write_raw_kaggle(raw, n=200, seed=3)
    get_criteo_ad_data(
        raw, "sub_processed", days=2, criteo_kaggle=True, memory_map=False,
        sub_sample_rate=0.9,
    )
    with np.load(str(tmp_path / "sub_processed.npz")) as data:
        y = data["y"]
    # ~90% of negatives dropped; positives all kept
    assert y.size < 200
    assert y.sum() == sum(
        1 for line in open(raw) if line.split("\t")[0] == "1"
    )


def test_cached_training_on_criteo(prepared):
    """End-to-end: cached trainer consumes the streaming Criteo dataset."""
    d, raw, prefix, pro = prepared
    from cdlrm_tpu.config import Config
    from cdlrm_tpu.train.trainer import CachedDlrmTrainer

    train = CriteoStreamingDataset(prefix, range(DAYS - 1), 16, split="train",
                                   drop_last=True)
    test = CriteoStreamingDataset(prefix, [DAYS - 1], 16, split="test")
    cfg = Config(
        arch_sparse_feature_size=8, arch_mlp_bot="13-16-8", arch_mlp_top="8-1",
        mini_batch_size=16, world_size=8, cache_size=32, num_ways=2,
        loss_function="bce", lookahead=2, print_freq=1000, table_agg_freq=3,
    )
    cfg.finalize(ln_emb=train.ln_emb, m_den=train.m_den)
    tr = CachedDlrmTrainer(cfg, train, test)
    m = tr.train(max_steps=5, log_fn=lambda s: None)
    acc, auc = tr.evaluate(log_fn=lambda s: None)
    tr.close()
    assert m.lookups > 0
    assert 0 <= acc <= 1


def test_terabyte_mode_preprocess_and_stream(tmp_path):
    """Terabyte naming convention: raw per-day files <raw>_0..<raw>_{D-1}
    (reference ships day_0..day_23; data_utils.py:904-962 skips the Kaggle
    split). Verifies artifacts + the streaming loader over them."""
    import numpy as np

    from cdlrm_tpu.data.criteo import CriteoStreamingDataset
    from cdlrm_tpu.data.preprocess import get_criteo_ad_data

    raw = str(tmp_path / "day")
    rng = np.random.default_rng(9)
    days, per_day = 3, 40
    for d in range(days):
        with open(f"{raw}_{d}", "w") as f:
            for _ in range(per_day):
                label = int(rng.random() < 0.3)
                dense = "\t".join(
                    str(int(rng.integers(0, 50))) if rng.random() > 0.1 else ""
                    for _ in range(13)
                )
                cats = "\t".join(
                    format(int(rng.integers(0, 1 << 20)), "x") for _ in range(26)
                )
                f.write(f"{label}\t{dense}\t{cats}\n")

    out = get_criteo_ad_data(
        raw, "tb_processed", days=days, criteo_kaggle=False, memory_map=True
    )
    import os

    prefix = str(tmp_path / "day")
    for d in range(days):
        assert os.path.exists(f"{prefix}_{d}_reordered.npz")

    train = CriteoStreamingDataset(prefix, range(days - 1), 16, split="train",
                                   drop_last=True)
    n = 0
    for b in train.batches():
        assert b.x.shape == (16, 13)
        assert b.ls_i.shape == (26, 16)
        n += 1
    assert n == (2 * per_day) // 16
    test = CriteoStreamingDataset(prefix, [days - 1], 16, split="test")
    total = sum(b.x.shape[0] for b in test.batches())
    assert total == -(-per_day // 2)


def test_bin_shuffle_skip_counts_full_batches(prepared, tmp_path):
    """batches(skip=k) under shuffle must skip k FULL batches — the data
    cursor's unit (the trainer drops partials before counting). With the
    partial entry at a random permuted position, skipping raw entries would
    shift the resumed stream by one whenever the partial precedes the
    resume point (review finding, round 2)."""
    d, raw, prefix, pro = prepared
    train_files = [f"{prefix}_{i}_reordered.npz" for i in range(DAYS - 1)]
    bin_path = str(tmp_path / "train_data.bin")
    numpy_to_binary(train_files, bin_path, split="train")
    counts_file = str(d / "train_fea_count.npz")
    bs = 13  # 80 samples -> 6 full batches + 1 partial (2 rows)
    found_partial_before = False
    for seed in range(40):
        ds = CriteoBinDataset(bin_path, counts_file, batch_size=bs,
                              shuffle=True, seed=seed)
        assert os.path.getsize(bin_path) % ds.bytes_per_entry != 0
        full_stream = [b for b in ds.batches() if b.x.shape[0] == bs]
        order = ds.batch_order()
        partial_pos = int(np.flatnonzero(order == ds.num_entries - 1))
        for k in (1, 3, 5):
            resumed = [b for b in ds.batches(skip=k) if b.x.shape[0] == bs]
            assert len(resumed) == len(full_stream) - k
            for a, bch in zip(full_stream[k:], resumed):
                np.testing.assert_array_equal(a.ls_i, bch.ls_i)
                np.testing.assert_array_equal(a.y, bch.y)
            if partial_pos < k + 1:
                found_partial_before = True
    assert found_partial_before  # the regression-triggering layout occurred


def test_dedup_probe_aux_overflow_raises():
    """Misses beyond aux capacity must raise the aux-capacity ValueError on
    the native dedup path too (previously wrote the rank scratch out of
    bounds before the guard could fire — review finding, round 2)."""
    import pytest

    from cdlrm_tpu.cache.geometry import CacheGeometry
    from cdlrm_tpu.cache.host_cache import HostCacheController
    from cdlrm_tpu.cache.master import MasterTables

    ln_emb = (200,)
    geo = CacheGeometry.build(ln_emb, 4, 16, 2, aux_capacity=8)
    ctrl = HostCacheController(geo, seed=0)
    master = MasterTables(ln_emb, 4, np.random.default_rng(0))
    ls = np.arange(32, dtype=np.int64)[None, :]  # 32 cold misses > aux 8
    with pytest.raises(ValueError, match="aux capacity"):
        ctrl.probe_dedup(ls, master, inv_bits=9)


def test_num_workers_streams_identical(prepared, tmp_path):
    """num_workers > 0 (parallel batch fetch on the bin loader; day-ahead
    decompress on the streaming loader — reference DataLoader num_workers,
    dlrm_data_pytorch.py:528-543) must produce the IDENTICAL stream,
    including under shuffle and mid-stream skip (the data-cursor contract),
    and concurrent iterators (trainer + prefetcher share one dataset) must
    not corrupt each other through the persistent file handle."""
    d, raw, prefix, pro = prepared
    train_files = [f"{prefix}_{i}_reordered.npz" for i in range(DAYS - 1)]
    bin_path = str(tmp_path / "train_data.bin")
    numpy_to_binary(train_files, bin_path, split="train")
    counts_file = str(d / "train_fea_count.npz")

    def collect(ds, skip=0):
        return list(ds.batches(skip=skip))

    def check_same(a, b):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x.ls_i, y.ls_i)
            np.testing.assert_allclose(x.x, y.x, rtol=1e-6)
            np.testing.assert_array_equal(x.y, y.y)

    for skip in (0, 2):
        base = collect(
            CriteoBinDataset(bin_path, counts_file, 16, shuffle=True, seed=3),
            skip,
        )
        par = collect(
            CriteoBinDataset(bin_path, counts_file, 16, shuffle=True, seed=3,
                             num_workers=3),
            skip,
        )
        check_same(base, par)
        sbase = collect(
            CriteoStreamingDataset(prefix, range(DAYS - 1), 16, split="train"),
            skip,
        )
        spar = collect(
            CriteoStreamingDataset(prefix, range(DAYS - 1), 16, split="train",
                                   num_workers=2),
            skip,
        )
        check_same(sbase, spar)

    # concurrent interleaved iterators over ONE dataset object (the trainer
    # and the prefetcher both stream it): per-thread persistent handles +
    # per-call seek keep them independent
    ds = CriteoBinDataset(bin_path, counts_file, 16)
    it1, it2 = ds.batches(), ds.batches()
    ref = collect(CriteoBinDataset(bin_path, counts_file, 16))
    out1, out2 = [], []
    for k in range(len(ref)):
        out1.append(next(it1))
        out2.append(next(it2))
    check_same(out1, ref)
    check_same(out2, ref)


def test_loader_worker_pinning(prepared, tmp_path, monkeypatch):
    """pin_base pins loader worker threads at base+id (the reference's
    criteo_worker_pin_fn layout, dlrm_data_pytorch.py:341-343) for both the
    bin fetch pool and the streaming day-ahead thread; no affinity syscall
    without it."""
    import os as os_mod
    import threading

    d, raw, prefix, pro = prepared
    train_files = [f"{prefix}_{i}_reordered.npz" for i in range(DAYS - 1)]
    bin_path = str(tmp_path / "train_data.bin")
    numpy_to_binary(train_files, bin_path, split="train")
    counts_file = str(d / "train_fea_count.npz")

    calls = []
    monkeypatch.setattr(
        os_mod, "sched_setaffinity",
        lambda pid, cores: calls.append(
            (threading.current_thread().name, frozenset(cores))
        ),
        raising=False,
    )
    ncpu = os_mod.cpu_count()

    ds = CriteoBinDataset(bin_path, counts_file, batch_size=8,
                          num_workers=2, pin_base=9)
    list(ds.batches())
    worker_cores = sorted(min(c) for n, c in calls if "Main" not in n)
    assert worker_cores == [9 % ncpu, 10 % ncpu]

    calls.clear()
    stream = CriteoStreamingDataset(
        prefix, range(DAYS - 1), 8, split="train", num_workers=1, pin_base=9
    )
    list(stream.batches())
    assert [min(c) for n, c in calls if "Main" not in n] == [9 % ncpu]

    calls.clear()
    unpinned = CriteoBinDataset(bin_path, counts_file, batch_size=8,
                                num_workers=2)
    list(unpinned.batches())
    assert not calls


def test_bin_host_rows_slice(prepared, tmp_path):
    """host_rows (config data_host_slice): only the host's row range is
    read — those rows match the full loader exactly, the rest are the
    zero-row transform; skip/shuffle ordering is unchanged; and the
    prefetcher's index view ignores the slice entirely (host-identical
    cache metadata is the multi-host determinism invariant)."""
    d, raw, prefix, pro = prepared
    train_files = [f"{prefix}_{i}_reordered.npz" for i in range(DAYS - 1)]
    bin_path = str(tmp_path / "train_data.bin")
    numpy_to_binary(train_files, bin_path, split="train")
    counts_file = str(d / "train_fea_count.npz")
    bs, lo, hi = 12, 3, 9

    full = CriteoBinDataset(bin_path, counts_file, batch_size=bs,
                            shuffle=True, seed=5)
    part = CriteoBinDataset(bin_path, counts_file, batch_size=bs,
                            shuffle=True, seed=5, host_rows=(lo, hi))
    zero = transform_batch(
        np.zeros((1, 13), np.int32), np.zeros((1, 26), np.int32),
        np.zeros(1, np.int32),
    )
    for k, (a, b) in enumerate(zip(full.batches(skip=2), part.batches(skip=2))):
        n = a.x.shape[0]
        assert b.x.shape[0] == n
        s, e = min(lo, n), min(hi, n)
        np.testing.assert_array_equal(a.x[s:e], b.x[s:e])
        np.testing.assert_array_equal(a.ls_i[:, s:e], b.ls_i[:, s:e])
        np.testing.assert_array_equal(a.y[s:e], b.y[s:e])
        out = np.r_[0:s, e:n]
        np.testing.assert_array_equal(b.x[out], np.broadcast_to(zero.x, (out.size, 13)))
        np.testing.assert_array_equal(b.ls_i[:, out], 0)
        np.testing.assert_array_equal(b.y[out], 0.0)
    # index view: bit-identical to the unsliced loader
    for ia, ib in zip(full.index_batches(), part.index_batches()):
        np.testing.assert_array_equal(ia, ib)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CriteoBinDataset(bin_path, counts_file, batch_size=bs,
                         host_rows=(9, 3))


def test_make_datasets_host_slice_wiring(prepared, monkeypatch):
    """config data_host_slice computes the process-major row range for the
    TRAIN loader only (test loader and a 1-process run stay unsliced)."""
    import jax

    from cdlrm_tpu.config import Config
    from cdlrm_tpu.data.criteo import make_criteo_datasets

    d, raw, prefix, pro = prepared
    # bin files for the factory's expected names
    train_files = [f"{prefix}_{i}_reordered.npz" for i in range(DAYS - 1)]
    numpy_to_binary(train_files, str(d / "train_data.bin"), split="train")
    numpy_to_binary([f"{prefix}_{DAYS-1}_reordered.npz"],
                    str(d / "test_data.bin"), split="test")

    def cfg_fn():
        return Config(
            arch_sparse_feature_size=8, arch_mlp_bot="13-8", arch_mlp_top="8-1",
            mini_batch_size=32, world_size=4, cache_size=16, num_ways=2,
            data_generation="dataset", data_set="kaggle",
            raw_data_file=raw, processed_data_file=str(d / "x.npz"),
            mlperf_bin_loader=True, data_host_slice=True,
        )

    train, test, _ = make_criteo_datasets(cfg_fn())
    assert train.host_rows is None  # 1 process: nothing to slice

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    train, test, _ = make_criteo_datasets(cfg_fn())
    assert train.host_rows == (16, 32)
    assert test.host_rows is None


def _fabricated_bin(tmp_path, rows, seed=3):
    rng = np.random.default_rng(seed)
    arr = np.concatenate(
        [rng.integers(0, 2, (rows, 1)), rng.integers(0, 100, (rows, 13)),
         rng.integers(0, 50, (rows, SPA_FEA))], axis=1,
    ).astype(np.int32)
    bin_path = tmp_path / "epochs.bin"
    bin_path.write_bytes(arr.tobytes())
    counts = tmp_path / "epochs_counts.npz"
    np.savez(counts, counts=np.full(SPA_FEA, 50, np.int64))
    return str(bin_path), str(counts)


def test_bin_epoch_seeded_shuffle(tmp_path):
    """Per-epoch shuffle (torch RandomSampler draws a NEW permutation each
    epoch, dlrm_data_pytorch.py:420): the restartable-stream analog is a
    (seed, epoch)-seeded permutation. Epoch 0 must stay bit-identical to
    the pre-epoch-aware order (checkpoint compatibility); every epoch's
    order is deterministic, distinct, shared by the index view, and
    composable with the full-batch skip unit."""
    bin_path, counts = _fabricated_bin(tmp_path, rows=8 * 9)
    ds = CriteoBinDataset(bin_path, counts, batch_size=8,
                          shuffle=True, seed=5)
    o0, o1 = ds.batch_order(0), ds.batch_order(1)
    # legacy pin: epoch 0 == the old single-permutation order
    np.testing.assert_array_equal(
        o0, np.random.default_rng(5).permutation(ds.num_entries))
    assert not np.array_equal(o0, o1)
    np.testing.assert_array_equal(o1, ds.batch_order(1))  # deterministic
    # the index view follows the same epoch order
    for ia, bat in zip(ds.index_batches(epoch=1), ds.batches(epoch=1)):
        np.testing.assert_array_equal(ia, bat.ls_i)
    # skip counts full batches WITHIN the epoch's order
    ref = list(ds.batches(epoch=1))
    skipped = list(ds.batches(skip=3, epoch=1))
    assert len(skipped) == len(ref) - 3
    for a, b in zip(ref[3:], skipped):
        np.testing.assert_array_equal(a.ls_i, b.ls_i)
    # unshuffled: epoch changes nothing
    plain = CriteoBinDataset(bin_path, counts, batch_size=8)
    np.testing.assert_array_equal(plain.batch_order(0),
                                  plain.batch_order(7))


def test_bin_shuffle_two_epoch_resume(tmp_path):
    """E2E through the whole epoch plumbing (pipeline._batches_from ->
    trainer cursor -> prefetcher _stream_iter): a 2-epoch shuffled
    bin-loader run resumed from a mid-epoch-2, mid-window checkpoint must
    bit-match the uninterrupted run — and the two epochs must actually
    train in different orders (the permutation is live, not cosmetic)."""
    from cdlrm_tpu.config import Config
    from cdlrm_tpu.train.trainer import CachedDlrmTrainer

    bin_path, counts = _fabricated_bin(tmp_path, rows=8 * 10 + 4)

    def make(shuffle=True):
        train = CriteoBinDataset(bin_path, counts, batch_size=8,
                                 shuffle=shuffle, seed=11)
        cfg = Config(
            arch_sparse_feature_size=8, arch_mlp_bot="13-16-8",
            arch_mlp_top="8-1", mini_batch_size=8, world_size=4,
            cache_size=64, num_ways=2, loss_function="bce", lookahead=4,
            print_freq=1000, table_agg_freq=4, nepochs=2,
            round_targets=True,
        )
        cfg.finalize(ln_emb=train.ln_emb, m_den=train.m_den)
        return cfg, train

    # epoch orders differ -> the two epochs' window uniques differ
    cfg, train = make()
    tr = CachedDlrmTrainer(cfg, train)
    tr.train(max_steps=20, log_fn=lambda s: None)  # 10 full batches/epoch
    assert tr.global_step == 20
    cache_ref = np.asarray(tr.cache).copy()
    occ_ref = [o.copy() for o in tr.controller.occupancy]
    tr.close()

    cfg1, train1 = make()
    tr1 = CachedDlrmTrainer(cfg1, train1)
    tr1.train(max_steps=15, log_fn=lambda s: None)
    assert tr1._cursor == (1, 5)  # mid-epoch-2, mid-window (5 % 4 != 0)
    ck = str(tmp_path / "ep2_mid")
    tr1.save_checkpoint(ck)
    tr1.close()

    cfg2, train2 = make()
    tr2 = CachedDlrmTrainer(cfg2, train2)
    tr2.load_checkpoint(ck)
    tr2.train(max_steps=20, log_fn=lambda s: None)
    assert tr2.global_step == 20
    tr2.close()

    for a, b in zip(tr2.controller.occupancy, occ_ref):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.asarray(tr2.cache), cache_ref,
                               rtol=1e-6, atol=1e-7)
