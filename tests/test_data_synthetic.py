import numpy as np

from cdlrm_tpu.data.synthetic import (
    Batch,
    SyntheticDataset,
    generate_uniform_batch,
    trace_generate_lru,
    trace_generate_rand,
    trace_profile,
    write_dist_to_file,
    read_dist_from_file,
)


def test_uniform_single_index(rng):
    b = generate_uniform_batch(rng, 13, [100, 50], 32, 1, True)
    assert b.x.shape == (32, 13)
    assert b.ls_i.shape == (2, 32)
    assert b.ls_mask is None
    assert b.y.shape == (32, 1)
    assert (b.ls_i[0] < 100).all() and (b.ls_i[1] < 50).all()
    assert ((b.y >= 0) & (b.y <= 1)).all()


def test_uniform_multihot_dedup(rng):
    b = generate_uniform_batch(rng, 4, [20], 64, 8, False)
    assert b.ls_i.shape == (1, 64, 8)
    counts = b.ls_mask[0].sum(axis=1)
    assert (counts >= 1).all() and (counts <= 8).all()
    # no duplicate valid indices within a lookup
    for i in range(64):
        vals = b.ls_i[0, i][b.ls_mask[0, i]]
        assert len(np.unique(vals)) == len(vals)


def test_round_targets(rng):
    b = generate_uniform_batch(rng, 4, [20], 64, 1, True, round_targets=True)
    assert set(np.unique(b.y)) <= {0.0, 1.0}


def test_dataset_restartable_identical_streams():
    ds = SyntheticDataset(m_den=4, ln_emb=np.array([50, 20]), data_size=64,
                          mini_batch_size=16, seed=7)
    a = list(ds.batches())
    b = list(ds.batches())
    assert len(a) == len(ds) == 4
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.ls_i, bb.ls_i)
        np.testing.assert_allclose(ba.x, bb.x)


def test_dataset_partial_last_batch():
    ds = SyntheticDataset(m_den=4, ln_emb=np.array([50]), data_size=20,
                          mini_batch_size=16, seed=7)
    sizes = [b.x.shape[0] for b in ds.batches()]
    assert sizes == [16, 4]


def test_trace_profile_and_lru_roundtrip(rng, tmp_path):
    # profile a simple trace, regenerate with the LRU model, check support
    trace = [1, 2, 3, 1, 2, 3, 1, 1, 4, 2]
    rstack, sds, accesses = trace_profile(trace)
    assert set(accesses) == {1, 2, 3, 4}
    assert sds.count(0) == 4  # four first accesses
    # build a cumulative distribution and generate
    import collections

    cnt = collections.Counter(sds)
    vals = sorted(cnt)
    total = sum(cnt.values())
    cumm = np.cumsum([cnt[v] / total for v in vals]).tolist()
    path = str(tmp_path / "dist_0.log")
    write_dist_to_file(path, accesses, vals, cumm)
    la, lv, lc = read_dist_from_file(path)
    assert la == [int(a) for a in accesses]
    out = trace_generate_lru(rng, la, lv, lc, 50)
    assert set(out) <= {1, 2, 3, 4}
    assert len(out) == 50


def test_trace_profile_padding():
    """enable_padding appends ceil(l/c) zero-distances (reference
    dlrm_data_pytorch.py:985-995): l=10 samples, max distance c=4 (the final
    access of 2 is 4 deep) -> ceil(10/4)=3 padding zeros on top of the 4
    genuine first-accesses."""
    trace = [1, 2, 3, 1, 2, 3, 1, 1, 4, 2]
    _, sds, _ = trace_profile(trace)
    _, sds_pad, _ = trace_profile(trace, enable_padding=True)
    assert max(sds) == 4 and len(sds) == 10
    assert len(sds_pad) == len(sds) + 3
    assert sds_pad[len(sds):] == [0, 0, 0]
    # degenerate all-new trace: c clamps to 1 instead of dividing by zero
    _, sds_new, _ = trace_profile([7, 8, 9], enable_padding=True)
    assert sds_new == [0, 0, 0, 0, 0, 0]


def test_trace_generate_rand_no_recency_reorder(rng):
    """The rand model (dlrm_data_pytorch.py:933-953) reads position l-sd
    without LRU reordering. With a distribution forcing sd=2 always
    (cumm=[1.0] at value 2) and stack [10, 20, 30] (l=3), every access
    reads index l-sd=1 -> 20, repeatedly — whereas the LRU model would
    rotate 20 to the MRU end and return a different element next."""
    la = [10, 20, 30]
    out = trace_generate_rand(rng, la, [2], [1.0], 5)
    assert out == [20, 20, 20, 20, 20]
    out_lru = trace_generate_lru(rng, la, [2], [1.0], 5)
    assert out_lru == [20, 20, 20, 20, 20] or out_lru != out  # lru reorders
    # sd=0 path: both models rotate the first-access list identically
    out0 = trace_generate_rand(rng, [1, 2, 3], [0], [1.0], 4)
    assert out0 == [1, 2, 3, 1]


def test_synthetic_dataset_trace_model_rand(rng, tmp_path):
    """SyntheticDataset(trace_model='rand') flows through
    generate_synthetic_batch and yields in-range multi-hot batches."""
    import collections

    trace = [1, 2, 3, 1, 2, 3, 1, 1, 4, 2]
    _, sds, accesses = trace_profile(trace)
    cnt = collections.Counter(sds)
    vals = sorted(cnt)
    total = sum(cnt.values())
    cumm = np.cumsum([cnt[v] / total for v in vals]).tolist()
    for t in range(2):
        write_dist_to_file(str(tmp_path / f"dist_{t}.log"), accesses, vals, cumm)
    ds = SyntheticDataset(
        m_den=4, ln_emb=[8, 6], data_size=16, mini_batch_size=8,
        num_indices_per_lookup=3, num_indices_per_lookup_fixed=False,
        data_generation="synthetic", trace_file=str(tmp_path / "dist_j.log"),
        trace_model="rand", seed=7,
    )
    batches = list(ds.batches())
    assert len(batches) == 2
    for b in batches:
        assert b.ls_i.shape == (2, 8, 3) and b.ls_mask.shape == (2, 8, 3)
        for t, size in enumerate([8, 6]):
            assert b.ls_i[t][b.ls_mask[t]].max() < size
            assert b.ls_mask[t].any(axis=-1).all()  # >=1 valid per lookup
