"""Model correctness: shapes, init statistics, and lockstep parity against a
freshly-written torch implementation of the same math (the reference's
equivalence-test pattern, SURVEY.md §4, applied to the model)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cdlrm_tpu.models.dlrm import (
    compute_loss,
    derive_top_mlp_input_dim,
    dlrm_forward,
    init_dlrm,
    interact_features,
)
from cdlrm_tpu.models.embedding import embedding_forward, init_embedding_tables
from cdlrm_tpu.models.mlp import apply_mlp, init_mlp


def test_derive_top_mlp_input_dim():
    # reference formula main_no_ddp.py:550-561: 26 sparse + 1 dense, dot
    assert derive_top_mlp_input_dim(26, 128, "dot", False) == 27 * 26 // 2 + 128
    assert derive_top_mlp_input_dim(26, 128, "dot", True) == 27 * 28 // 2 + 128
    assert derive_top_mlp_input_dim(26, 16, "cat", False) == 27 * 16


def test_mlp_shapes_and_activation(rng):
    params = init_mlp(rng, [13, 64, 16])
    x = rng.random((8, 13)).astype(np.float32)
    y = apply_mlp(params, jnp.asarray(x))
    assert y.shape == (8, 16)
    assert (np.asarray(y) >= 0).all()  # relu output
    y_sig = apply_mlp(params, jnp.asarray(x), sigmoid_layer=1)
    assert ((np.asarray(y_sig) > 0) & (np.asarray(y_sig) < 1)).all()


def test_interaction_dot_counts(rng):
    b, t, d = 4, 5, 8
    x = jnp.asarray(rng.random((b, d)).astype(np.float32))
    ly = jnp.asarray(rng.random((t, b, d)).astype(np.float32))
    r = interact_features(x, ly, "dot", False)
    nf = t + 1
    assert r.shape == (b, d + nf * (nf - 1) // 2)
    r2 = interact_features(x, ly, "dot", True)
    assert r2.shape == (b, d + nf * (nf + 1) // 2)
    rc = interact_features(x, ly, "cat", False)
    assert rc.shape == (b, d + t * d)


def test_interaction_dot_values(rng):
    """The extracted pairs must be exactly the pairwise dots, strict lower
    triangle in (row, col) order (reference model_no_ddp.py:286-291)."""
    b, t, d = 2, 3, 4
    x = rng.random((b, d)).astype(np.float32)
    ly = rng.random((t, b, d)).astype(np.float32)
    r = np.asarray(interact_features(jnp.asarray(x), jnp.asarray(ly), "dot", False))
    feats = np.concatenate([x[None], ly], axis=0)  # [F, B, D]
    expected = []
    for i in range(t + 1):
        for j in range(i):
            expected.append(np.sum(feats[i] * feats[j], axis=1))
    expected = np.stack(expected, axis=1)
    np.testing.assert_allclose(r[:, d:], expected, rtol=1e-5)


def test_losses(rng):
    z = jnp.asarray([[0.9], [0.1]])
    t = jnp.asarray([[1.0], [0.0]])
    mse = float(compute_loss(z, t, "mse"))
    assert abs(mse - np.mean([0.01, 0.01])) < 1e-6
    bce = float(compute_loss(z, t, "bce"))
    assert abs(bce - (-np.log(0.9))) < 1e-5
    wbce = float(compute_loss(z, t, "wbce", (2.0, 0.5)))
    # target 1 -> weight[1]=0.5, target 0 -> weight[0]=2.0
    expected = np.mean([0.5 * -np.log(0.9), 2.0 * -np.log(0.9)])
    assert abs(wbce - expected) < 1e-5


def test_dlrm_forward_range_and_clamp(rng):
    ln_bot, ln_top = [13, 8, 4], [4 + 3 * 2 // 2 * 2 // 2, 4, 1]
    ln_top = [derive_top_mlp_input_dim(2, 4, "dot", False), 4, 1]
    params = init_dlrm(rng, ln_bot, ln_top)
    x = jnp.asarray(rng.random((16, 13)).astype(np.float32))
    ly = jnp.asarray(rng.random((2, 16, 4)).astype(np.float32))
    p = np.asarray(dlrm_forward(params, x, ly))
    assert p.shape == (16, 1)
    assert ((p > 0) & (p < 1)).all()
    p2 = np.asarray(dlrm_forward(params, x, ly, loss_threshold=0.4))
    assert ((p2 >= 0.4) & (p2 <= 0.6)).all()


def test_embedding_forward_single_and_pooled(rng):
    tables = init_embedding_tables(rng, [50, 30], 8)
    ls_i = np.array([[1, 2, 3], [0, 29, 5]])
    ly = np.asarray(embedding_forward(tables, jnp.asarray(ls_i)))
    assert ly.shape == (2, 3, 8)
    np.testing.assert_allclose(ly[0, 1], np.asarray(tables[0])[2], rtol=1e-6)
    # pooled: masked sum equals sum of selected rows
    ls_ip = np.array([[[1, 2, 0]], [[3, 0, 0]]])  # [T=2, B=1, P=3]
    mask = np.array([[[True, True, False]], [[True, False, False]]])
    lyp = np.asarray(
        embedding_forward(tables, jnp.asarray(ls_ip), jnp.asarray(mask))
    )
    np.testing.assert_allclose(
        lyp[0, 0], np.asarray(tables[0])[1] + np.asarray(tables[0])[2], rtol=1e-6
    )
    np.testing.assert_allclose(lyp[1, 0], np.asarray(tables[1])[3], rtol=1e-6)


def test_torch_lockstep_parity(rng):
    """Forward parity with a torch implementation of the same arch
    (weights copied, dot interaction, sigmoid top)."""
    torch = pytest.importorskip("torch")
    ln_bot = [13, 32, 16]
    t_count, d, b = 3, 16, 8
    ln_top = [derive_top_mlp_input_dim(t_count, d, "dot", False), 8, 1]
    params = init_dlrm(rng, ln_bot, ln_top)
    x = rng.random((b, 13)).astype(np.float32)
    ly = rng.random((t_count, b, d)).astype(np.float32)
    ours = np.asarray(dlrm_forward(params, jnp.asarray(x), jnp.asarray(ly)))

    def torch_mlp(layers, inp, sigmoid_layer):
        h = torch.tensor(inp)
        for i, (w, bb) in enumerate(layers):
            lin = torch.nn.functional.linear(
                h, torch.tensor(np.asarray(w).T), torch.tensor(np.asarray(bb))
            )
            h = torch.sigmoid(lin) if i == sigmoid_layer else torch.relu(lin)
        return h

    xb = torch_mlp(params["bot"], x, -1)
    feats = torch.cat([xb.unsqueeze(1), torch.tensor(ly).permute(1, 0, 2)], dim=1)
    z = torch.bmm(feats, feats.transpose(1, 2))
    nf = t_count + 1
    li = [i for i in range(nf) for j in range(i)]
    lj = [j for i in range(nf) for j in range(i)]
    r = torch.cat([xb, z[:, li, lj]], dim=1)
    theirs = torch_mlp(params["top"], r.numpy(), len(params["top"]) - 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)
