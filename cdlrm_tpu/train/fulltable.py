"""Uncached trainer: full embedding tables resident in device HBM.

No reference equivalent (the reference always trains through the cache);
this is the small-config / oracle / upstream-facebook-DLRM-style path, and
the only path where the QR / mixed-dimension compression tricks are usable
(see models/tricks.py on why the reference's cached path breaks with them).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cdlrm_tpu.config import Config
from cdlrm_tpu.data.synthetic import Batch
from cdlrm_tpu.models.dlrm import init_dlrm
from cdlrm_tpu.models.embedding import init_embedding_tables
from cdlrm_tpu.parallel.mesh import DP_AXIS, make_dp_mesh
from cdlrm_tpu.train import step as step_lib
from cdlrm_tpu.utils.metrics import StreamingAUC, accuracy_count


class FullTableDlrmTrainer:
    def __init__(self, cfg: Config, dataset, test_dataset=None, mesh=None):
        assert cfg.ln_emb is not None, "call cfg.finalize() first"
        assert jax.process_count() == 1, (
            "FullTableDlrmTrainer is single-process; multi-host runs use the "
            "cached trainer (use_cache=True) with row-sharded masters"
        )
        self.cfg = cfg
        self.dataset = dataset
        self.test_dataset = test_dataset
        self.mesh = mesh if mesh is not None else make_dp_mesh(cfg.world_size)
        self.ndev = self.mesh.devices.size
        rng = np.random.default_rng(cfg.numpy_rand_seed)
        m_spa = cfg.m_spa_per_table if cfg.md_flag else cfg.m_spa
        params = {
            **init_dlrm(rng, cfg.ln_bot, cfg.ln_top),
            "emb": init_embedding_tables(
                rng,
                cfg.ln_emb,
                m_spa,
                qr_flag=cfg.qr_flag,
                qr_collisions=cfg.qr_collisions,
                qr_threshold=cfg.qr_threshold,
                qr_operation=cfg.qr_operation,
                md_flag=cfg.md_flag,
                md_threshold=cfg.md_threshold,
            ),
        }
        self.params = step_lib.replicate_for_mesh(params, self.mesh)
        # optimizer state (config.py optimizer doc): element-wise dense
        # accumulators + per-table ROW-WISE [N] accumulators — the oracle
        # the cached adagrad path matches exactly when fully resident
        self._adagrad = cfg.optimizer == "adagrad"
        if self._adagrad:
            accum = {
                "bot": jax.tree_util.tree_map(np.zeros_like, params["bot"]),
                "top": jax.tree_util.tree_map(np.zeros_like, params["top"]),
                "emb": [np.zeros(w.shape[0], np.float32)
                        for w in params["emb"]],
            }
            self.accum = step_lib.replicate_for_mesh(accum, self.mesh)
        else:
            self.accum = None
        scfg = step_lib.StepConfig(
            interaction_op=cfg.arch_interaction_op,
            interaction_itself=cfg.arch_interaction_itself,
            loss_function=cfg.loss_function,
            loss_weights=tuple(cfg.loss_weights_list),
            loss_threshold=cfg.loss_threshold,
            strict_bias_divergence=cfg.strict_bias_divergence,
            compute_dtype=cfg.compute_dtype,
            optimizer=cfg.optimizer,
            adagrad_eps=cfg.adagrad_eps,
        )
        self._pooled = cfg.num_indices_per_lookup > 1 or not cfg.num_indices_per_lookup_fixed
        self.train_step = step_lib.make_fulltable_train_step(
            self.mesh, scfg, pooled=self._pooled
        )
        self.eval_step = step_lib.make_fulltable_eval_step(
            self.mesh, scfg, pooled=self._pooled
        )
        self._lr = jnp.float32(cfg.learning_rate)
        self._lr_emb = jnp.float32(cfg.lr_embeds)
        self.global_step = 0

    def _put(self, batch: Batch):
        mesh = self.mesh
        mask = batch.ls_mask
        if mask is None:
            mask = np.zeros_like(batch.ls_i)
        return (
            jax.device_put(batch.x, NamedSharding(mesh, P(DP_AXIS))),
            jax.device_put(batch.ls_i, NamedSharding(mesh, P(None, DP_AXIS))),
            jax.device_put(mask, NamedSharding(mesh, P(None, DP_AXIS))),
            jax.device_put(batch.y, NamedSharding(mesh, P(DP_AXIS))),
        )

    def train(self, max_steps: Optional[int] = None, log_fn=print):
        cfg = self.cfg
        b = cfg.mini_batch_size
        pending = []  # device scalars; materialized only at print boundaries
        loss_carry = corr_carry = n_carry = 0.0
        t0 = time.perf_counter()

        def flush():
            vals = jax.device_get(
                [x.addressable_shards[0].data for ls, c in pending for x in (ls, c)]
            )
            loss_acc = sum(float(v) for v in vals[0::2])
            corr_acc = sum(float(v) for v in vals[1::2])
            n = len(pending) * b
            pending.clear()
            return loss_acc, corr_acc, n

        for epoch in range(cfg.nepochs):
            # per-epoch shuffle protocol (data/criteo.py CriteoBinDataset):
            # the oracle must consume the SAME epoch order as the cached
            # trainer or the comparisons diverge on data, not dynamics
            kw = (
                {"epoch": epoch}
                if getattr(self.dataset, "epoch_seeded_shuffle", False)
                else {}
            )
            for j, batch in enumerate(self.dataset.batches(**kw)):
                if batch.x.shape[0] != b:
                    continue
                if max_steps is not None and self.global_step >= max_steps:
                    return
                x, ls_i, mask, tgt = self._put(batch)
                if self._adagrad:
                    self.params, self.accum, loss_sum, correct = (
                        self.train_step(
                            self.params, x, ls_i, mask, tgt,
                            self._lr, self._lr_emb, self.accum,
                        )
                    )
                else:
                    self.params, loss_sum, correct = self.train_step(
                        self.params, x, ls_i, mask, tgt,
                        self._lr, self._lr_emb,
                    )
                self.global_step += 1
                pending.append((loss_sum, correct))
                if len(pending) >= 4096:
                    # bound live device scalars (and re-establish host-device
                    # backpressure) on huge print windows
                    la, ca, na = flush()
                    loss_carry += la; corr_carry += ca; n_carry += na
                if j > 0 and j % cfg.print_freq == 0:
                    loss_acc, corr_acc, n_acc = flush()
                    loss_acc += loss_carry; corr_acc += corr_carry
                    n_acc += int(n_carry)
                    loss_carry = corr_carry = n_carry = 0.0
                    dt = time.perf_counter() - t0
                    log_fn(
                        f"Epoch {epoch}: {j}/{len(self.dataset)} "
                        f"{1000*dt/max(1,n_acc//b):.2f} ms/it, "
                        f"loss {loss_acc/max(1,n_acc):.5f}, acc {corr_acc/max(1,n_acc):.5f}"
                    )
                    t0 = time.perf_counter()

    def evaluate(self, max_batches: Optional[int] = None, log_fn=print):
        total, correct = 0, 0
        auc = StreamingAUC()
        tb = self.cfg.test_mini_batch_size
        tb_loc = -(-tb // self.ndev)
        from cdlrm_tpu.train.trainer import _pad_batch

        for i, batch in enumerate(self.test_dataset.batches()):
            if max_batches is not None and i >= max_batches:
                break
            n = batch.x.shape[0]
            batch = _pad_batch(batch, tb_loc * self.ndev)
            x, ls_i, mask, _ = self._put(batch)
            scores = np.asarray(self.eval_step(self.params, x, ls_i, mask))[:n]
            correct += accuracy_count(scores, batch.y[:n])
            total += n
            auc.update(scores, batch.y[:n])
        acc = correct / max(1, total)
        auc_v = auc.result()
        log_fn(f"Test accuracy = {100.0 * acc:.4f}%  AUC = {auc_v:.5f}")
        return acc, auc_v

    def save_checkpoint(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        params = step_lib.unreplicate(self.params)
        leaves, _ = jax.tree_util.tree_flatten(params)
        np.savez(
            os.path.join(path, "fulltable_params.npz"),
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        if self._adagrad:
            acc_leaves, _ = jax.tree_util.tree_flatten(
                step_lib.unreplicate(self.accum)
            )
            np.savez(
                os.path.join(path, "fulltable_acc.npz"),
                **{f"leaf_{i}": np.asarray(l)
                   for i, l in enumerate(acc_leaves)},
            )
        with open(os.path.join(path, "meta.pkl"), "wb") as f:
            pickle.dump({"global_step": self.global_step}, f)

    def load_checkpoint(self, path: str) -> None:
        params = step_lib.unreplicate(self.params)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        with np.load(os.path.join(path, "fulltable_params.npz")) as data:
            leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        self.params = step_lib.replicate_for_mesh(
            jax.tree_util.tree_unflatten(treedef, leaves), self.mesh
        )
        acc_file = os.path.join(path, "fulltable_acc.npz")
        if self._adagrad and not os.path.exists(acc_file):
            raise ValueError(
                f"optimizer='adagrad' but {path!r} carries no optimizer "
                "state (saved by an SGD run?); resume with the matching "
                "optimizer"
            )
        if not self._adagrad and os.path.exists(acc_file):
            raise ValueError(
                f"{path!r} carries AdaGrad optimizer state but this run is "
                "optimizer='sgd'; resuming would silently drop the "
                "accumulators — pass --optimizer adagrad"
            )
        if self._adagrad:
            acc_leaves, acc_treedef = jax.tree_util.tree_flatten(
                step_lib.unreplicate(self.accum)
            )
            with np.load(acc_file) as data:
                acc_leaves = [data[f"leaf_{i}"]
                              for i in range(len(acc_leaves))]
            self.accum = step_lib.replicate_for_mesh(
                jax.tree_util.tree_unflatten(acc_treedef, acc_leaves),
                self.mesh,
            )
        with open(os.path.join(path, "meta.pkl"), "rb") as f:
            self.global_step = pickle.load(f)["global_step"]

    def close(self) -> None:
        pass
