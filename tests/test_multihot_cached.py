"""Multi-hot (pooled bag) lookups through the cached path: probe masking,
pooled step parity vs a full-table oracle on the same rows, and e2e training."""

import numpy as np
import pytest

from cdlrm_tpu.config import Config
from cdlrm_tpu.data.synthetic import SyntheticDataset
from cdlrm_tpu.train.trainer import CachedDlrmTrainer


def make_cfg(**kw):
    base = dict(
        arch_sparse_feature_size=8,
        arch_mlp_bot="13-16-8",
        arch_mlp_top="8-1",
        mini_batch_size=32,
        world_size=8,
        cache_size=64,
        num_ways=4,
        loss_function="bce",
        lookahead=3,
        print_freq=1000,
        table_agg_freq=7,
        num_indices_per_lookup=4,
        num_indices_per_lookup_fixed=False,
        round_targets=True,
    )
    base.update(kw)
    cfg = Config(**base)
    cfg.finalize(ln_emb=np.array([500, 200, 1000]))
    return cfg


def test_probe_masked_positions():
    from cdlrm_tpu.cache.geometry import CacheGeometry
    from cdlrm_tpu.cache.host_cache import HostCacheController
    from cdlrm_tpu.cache.master import MasterTables

    geo = CacheGeometry.build([100], 4, 10, 2, aux_capacity=16)
    master = MasterTables([100], 4, np.random.default_rng(0))
    ctrl = HostCacheController(geo, seed=0)
    ls_i = np.array([[5, 7, 0, 9]])
    valid = np.array([[True, True, False, True]])
    pr = ctrl.probe(ls_i, master, valid=valid)
    assert pr.slots[0, 2] == geo.trash_row  # masked position
    assert pr.num_lookups == 3
    assert pr.hit_counts[0] == 0
    # three misses staged (the masked 0 is NOT fetched)
    assert pr.aux_slots.shape[0] == 3
    np.testing.assert_allclose(pr.aux_rows[0], master.tables[0][5])


def test_multihot_cached_trains_and_pools_correctly():
    cfg = make_cfg()
    ds = SyntheticDataset(
        m_den=13, ln_emb=cfg.ln_emb, data_size=32 * 24, mini_batch_size=32,
        num_indices_per_lookup=4, num_indices_per_lookup_fixed=False,
        round_targets=True, seed=11,
    )
    tr = CachedDlrmTrainer(cfg, ds, ds)
    assert tr.pooled_width == 4
    m = tr.train(max_steps=12, log_fn=lambda s: None)
    acc, auc = tr.evaluate(max_batches=3, log_fn=lambda s: None)
    tr.close()
    assert m.lookups > 0
    assert 0.0 < m.hit_rate <= 1.0
    assert 0.0 <= acc <= 1.0


def test_multihot_cached_forward_matches_fulltable_oracle():
    """With a 100%-hitting cache (tables smaller than cache), the cached
    pooled forward must equal the full-table pooled forward on the same
    weights."""
    import jax
    import jax.numpy as jnp

    from cdlrm_tpu.models.dlrm import dlrm_forward
    from cdlrm_tpu.models.embedding import embedding_forward

    ln_emb = np.array([40, 30])
    cfg = make_cfg(cache_size=64, num_ways=2, mini_batch_size=16, world_size=8)
    cfg.finalize(ln_emb=ln_emb)
    ds = SyntheticDataset(
        m_den=13, ln_emb=ln_emb, data_size=16 * 6, mini_batch_size=16,
        num_indices_per_lookup=4, num_indices_per_lookup_fixed=False, seed=5,
    )
    tr = CachedDlrmTrainer(cfg, ds, ds)
    # one refill covers everything: tables fit entirely (sets = n)
    tr._start_pipeline()
    w = tr.prefetcher.get_window()
    tr._apply_refill(w)
    batch = next(ds.batches())
    (x, slots, mask, aux_s, aux_r, tgt), _, _, _ = tr._assemble(
        batch, cfg.local_batch_size
    )
    tr.cache, scores = tr.eval_step(
        tr.params, tr.cache, x, slots, mask, aux_s, aux_r
    )
    scores_cached = np.asarray(scores)
    # oracle: gather the same rows from the master tables
    tables = [jnp.asarray(t) for t in tr.master.tables]
    ly = embedding_forward(tables, jnp.asarray(batch.ls_i), jnp.asarray(batch.ls_mask))
    p0 = {k: v for k, v in zip(["bot", "top"], [None, None])}
    from cdlrm_tpu.train.step import unreplicate

    p0 = unreplicate(tr.params)
    scores_oracle = np.asarray(
        dlrm_forward(p0, jnp.asarray(batch.x), ly, "dot", False, cfg.loss_threshold)
    )
    tr.close()
    # NOTE: cached rows came from the master at refill time and got no
    # training updates (lr steps not taken) -> identical values
    np.testing.assert_allclose(scores_cached, scores_oracle, rtol=2e-4, atol=1e-5)
