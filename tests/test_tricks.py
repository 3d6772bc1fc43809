import numpy as np
import jax.numpy as jnp

from cdlrm_tpu.models.tricks import (
    init_md_embedding,
    init_qr_embedding,
    md_lookup,
    md_solver,
    qr_lookup,
)


def test_qr_lookup_semantics(rng):
    n, d, c = 100, 8, 4
    for op in ("mult", "add", "concat"):
        p = init_qr_embedding(rng, n, d, c, operation=op)
        idx = np.array([0, 5, 99, 42])
        out = np.asarray(qr_lookup(p, jnp.asarray(idx)))
        wq, wr = np.asarray(p.weight_q), np.asarray(p.weight_r)
        eq, er = wq[idx // c], wr[idx % c]
        if op == "mult":
            np.testing.assert_allclose(out, eq * er, rtol=1e-6)
        elif op == "add":
            np.testing.assert_allclose(out, eq + er, rtol=1e-6)
        else:
            assert out.shape == (4, 2 * d)
            np.testing.assert_allclose(out, np.concatenate([eq, er], 1), rtol=1e-6)


def test_qr_table_sizes(rng):
    p = init_qr_embedding(rng, 103, 8, 4)
    assert p.weight_q.shape == (26, 8)  # ceil(103/4)
    assert p.weight_r.shape == (4, 8)


def test_md_lookup_projection(rng):
    p = init_md_embedding(rng, 50, 4, base_dim=16)
    out = np.asarray(md_lookup(p, jnp.asarray(np.array([1, 2]))))
    assert out.shape == (2, 16)
    expected = np.asarray(p.weight)[[1, 2]] @ np.asarray(p.proj)
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    # equal dims -> identity projection
    p2 = init_md_embedding(rng, 50, 16, base_dim=16)
    assert p2.proj is None


def test_md_solver_alpha_power_rule():
    n = [1000, 10, 100000]
    d = md_solver(n, alpha=0.3, d0=64, round_dim=False)
    # dims aligned to INPUT order, monotonically decreasing in table size
    assert d[1] >= d[0] >= d[2]
    # smallest table gets the base dim d0
    assert d[1] == 64
    d_rounded = md_solver(n, alpha=0.3, d0=64, round_dim=True)
    assert all((v & (v - 1)) == 0 for v in d_rounded)  # powers of two


def test_md_solver_budget():
    n = [100, 200, 400]
    d = md_solver(n, alpha=0.5, budget=3200, round_dim=False)
    assert (d >= 1).all()
