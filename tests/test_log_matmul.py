"""logmatmulexp: correctness + analytic custom VJP (ops/log_matmul.py).

Replaces the retired Pallas-kernel tests — see the module docstring of
``pyro_tpu/ops/log_matmul.py`` for the measured XLA-wins conclusion.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import logsumexp as scipy_lse

from pyro_tpu.ops.log_matmul import _bwd, _logmatmulexp_raw, logmatmulexp


def test_matches_ground_truth():
    k = jax.random.key(0)
    x = jax.random.normal(k, (128, 64)) * 3
    y = jax.random.normal(jax.random.fold_in(k, 1), (64, 96)) * 3
    actual = np.asarray(logmatmulexp(x, y))
    gt = scipy_lse(
        np.asarray(x)[:, :, None] + np.asarray(y)[None, :, :], axis=1
    )
    assert np.allclose(actual, gt, rtol=1e-4, atol=1e-4)


def test_batched_and_broadcast():
    k = jax.random.key(3)
    x = jax.random.normal(k, (4, 32, 16)) * 2
    y = jax.random.normal(jax.random.fold_in(k, 1), (4, 16, 24)) * 2
    out = np.asarray(logmatmulexp(x, y))
    for b in range(4):
        gt = scipy_lse(
            np.asarray(x)[b][:, :, None] + np.asarray(y)[b][None, :, :],
            axis=1,
        )
        assert np.allclose(out[b], gt, rtol=1e-4, atol=1e-4)
    # broadcast batch on one side
    out2 = logmatmulexp(x[0], y)
    assert out2.shape == (4, 32, 24)


def test_neg_inf_rows_no_nan():
    """-inf blocks (masked transitions) must not produce NaNs."""
    k = jax.random.key(5)
    x = jax.random.normal(k, (64, 64)).at[0, :].set(-jnp.inf)
    y = jax.random.normal(jax.random.fold_in(k, 1), (64, 64))
    actual = np.asarray(logmatmulexp(x, y))
    assert not np.isnan(actual).any()
    # the tiny-clamp maps log(0) to log(f32 tiny) ~ -87, kept finite so
    # gradients stay defined
    assert (actual[0] < -80).all()


def test_custom_vjp_matches_autodiff():
    k = jax.random.key(2)
    for shape_x, shape_y in [((8, 16), (16, 8)), ((3, 8, 16), (3, 16, 8))]:
        x = jax.random.normal(k, shape_x)
        y = jax.random.normal(jax.random.fold_in(k, 1), shape_y)
        g = jax.random.normal(
            jax.random.fold_in(k, 2), shape_x[:-1] + shape_y[-1:]
        )

        def f(x, y):
            return jnp.sum(_logmatmulexp_raw(x, y) * g)

        dx_ref, dy_ref = jax.grad(f, argnums=(0, 1))(x, y)
        out = _logmatmulexp_raw(x, y)
        dx, dy = _bwd((x, y, out), g)
        assert np.allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
        assert np.allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=1e-5)


def test_vjp_bounded_when_product_underflows():
    """Regression for the TPU hmm-enum NaN: when a whole row of the
    shifted product Z = P @ Q underflows (peaked alpha x near-zero
    transition probs, e.g. after ~40 MAP steps), the old backward's
    g/Z factor overflowed and 0 * inf produced NaN gradients.  The
    re-shifted backward must stay finite AND match the softmax-weighted
    ground truth dx = sum_j g * exp(x + y - out)."""
    k = jax.random.key(7)
    # alpha-style row with one dominant state; transitions out of that
    # state are ~exp(-200): every Z entry underflows f32
    x = jnp.full((4, 8), -300.0).at[:, 0].set(0.0)
    y = jnp.full((8, 8), -200.0).at[1:, :].set(-1.0)
    g = jax.random.normal(k, (4, 8)) * 5.0

    def f(x, y):
        return jnp.sum(logmatmulexp(x, y) * g)

    dx, dy = jax.grad(f, argnums=(0, 1))(x, y)
    assert np.isfinite(np.asarray(dx)).all()
    assert np.isfinite(np.asarray(dy)).all()
    # ground truth from the (bounded) unfused 3-tensor formulation,
    # with out recomputed exactly as the forward produced it
    out = _logmatmulexp_raw(x, y)
    w = np.exp(
        np.asarray(x)[:, :, None]
        + np.asarray(y)[None, :, :]
        - np.asarray(out)[:, None, :]
    )
    dx_gt = (np.asarray(g)[:, None, :] * w).sum(-1)
    dy_gt = (np.asarray(g)[:, None, :] * w).sum(0)
    assert np.allclose(np.asarray(dx), dx_gt, rtol=1e-4, atol=1e-6)
    assert np.allclose(np.asarray(dy), dy_gt, rtol=1e-4, atol=1e-6)


def test_vjp_no_nan_with_neg_inf_operands():
    """-inf operand entries (hard-masked transitions) + underflowing
    products together must still give finite (zero) gradients."""
    x = jnp.full((4, 8), -300.0).at[:, 0].set(0.0).at[0, :].set(-jnp.inf)
    y = jnp.full((8, 8), -200.0).at[:, 3].set(-jnp.inf)
    g = jnp.ones((4, 8))

    def f(x, y):
        return jnp.sum(logmatmulexp(x, y) * g)

    dx, dy = jax.grad(f, argnums=(0, 1))(x, y)
    assert np.isfinite(np.asarray(dx)).all()
    assert np.isfinite(np.asarray(dy)).all()


def test_custom_vjp_broadcast_batch():
    """VJP reduces broadcasted batch dims back to operand shapes."""
    k = jax.random.key(9)
    x = jax.random.normal(k, (8, 16))  # no batch
    y = jax.random.normal(jax.random.fold_in(k, 1), (5, 16, 8))

    def loss(x, y):
        return jnp.sum(logmatmulexp(x, y) ** 2)

    def loss_ref(x, y):
        return jnp.sum(_logmatmulexp_raw(x, y) ** 2)

    dx, dy = jax.grad(loss, argnums=(0, 1))(x, y)
    dx_ref, dy_ref = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    assert dx.shape == x.shape and dy.shape == y.shape
    assert np.allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=1e-5)
