"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as scipy_lse

from pyro_tpu.ops.pallas.log_einsum import (
    _logmatmulexp_pallas,
    _logmatmulexp_xla,
    _fused_bwd,
)


def test_pallas_kernel_matches_xla_interpret():
    k = jax.random.key(0)
    x = jax.random.normal(k, (128, 256)) * 3
    y = jax.random.normal(jax.random.fold_in(k, 1), (256, 128)) * 3
    expected = np.asarray(_logmatmulexp_xla(x, y))
    actual = np.asarray(_logmatmulexp_pallas(x, y, interpret=True))
    assert np.allclose(actual, expected, rtol=1e-4, atol=1e-4)
    # ground truth
    gt = scipy_lse(
        np.asarray(x)[:, :, None] + np.asarray(y)[None, :, :], axis=1
    )
    assert np.allclose(actual, gt, rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_autodiff():
    k = jax.random.key(2)
    x = jax.random.normal(k, (8, 16))
    y = jax.random.normal(jax.random.fold_in(k, 1), (16, 8))
    g = jax.random.normal(jax.random.fold_in(k, 2), (8, 8))

    # reference gradient via autodiff of the XLA formulation
    def f(x, y):
        return jnp.sum(_logmatmulexp_xla(x, y) * g)

    dx_ref, dy_ref = jax.grad(f, argnums=(0, 1))(x, y)
    out = _logmatmulexp_xla(x, y)
    dx, dy = _fused_bwd((x, y, out), g)
    assert np.allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=1e-5)
