import numpy as np

from cdlrm_tpu.data.synthetic import (
    Batch,
    SyntheticDataset,
    generate_uniform_batch,
    trace_generate_lru,
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
