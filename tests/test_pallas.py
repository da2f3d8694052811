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
    _pick_tile,
)


def test_pallas_kernel_matches_xla_interpret():
    k = jax.random.key(0)
    x = jax.random.normal(k, (1, 128, 256)) * 3
    y = jax.random.normal(jax.random.fold_in(k, 1), (1, 256, 128)) * 3
    expected = np.asarray(_logmatmulexp_xla(x, y))
    actual = np.asarray(_logmatmulexp_pallas(x, y, interpret=True))
    assert np.allclose(actual, expected, rtol=1e-4, atol=1e-4)
    # ground truth
    gt = scipy_lse(
        np.asarray(x)[0][:, :, None] + np.asarray(y)[0][None, :, :],
        axis=1,
    )
    assert np.allclose(actual[0], gt, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_batched_grid_interpret():
    """Batched (B, S, S) operands — the DiscreteHMM pairwise-reduction
    shape class — run through the gridded kernel."""
    k = jax.random.key(3)
    B, M, K, N = 4, 256, 128, 384
    x = jax.random.normal(k, (B, M, K)) * 2
    y = jax.random.normal(jax.random.fold_in(k, 1), (B, K, N)) * 2
    expected = np.asarray(_logmatmulexp_xla(x, y))
    actual = np.asarray(_logmatmulexp_pallas(x, y, interpret=True))
    assert np.allclose(actual, expected, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_neg_inf_rows_interpret():
    """-inf blocks (masked transitions) must not produce NaNs."""
    k = jax.random.key(5)
    x = jax.random.normal(k, (1, 128, 128))
    x = x.at[0, 0, :].set(-jnp.inf)
    y = jax.random.normal(jax.random.fold_in(k, 1), (1, 128, 128))
    actual = np.asarray(_logmatmulexp_pallas(x, y, interpret=True))
    expected = np.asarray(_logmatmulexp_xla(x, y))
    finite = np.isfinite(expected)
    assert np.allclose(actual[finite], expected[finite], rtol=1e-4, atol=1e-4)
    assert not np.isnan(actual).any()


def test_pick_tile():
    assert _pick_tile(512, 512) in (128, 256)
    assert 512 % _pick_tile(512, 512) == 0
    # indivisible dim degrades to a single whole block
    assert _pick_tile(130, 130) == 130


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


def test_custom_vjp_matches_autodiff_batched():
    k = jax.random.key(7)
    B = 3
    x = jax.random.normal(k, (B, 8, 16))
    y = jax.random.normal(jax.random.fold_in(k, 1), (B, 16, 8))
    g = jax.random.normal(jax.random.fold_in(k, 2), (B, 8, 8))

    def f(x, y):
        return jnp.sum(_logmatmulexp_xla(x, y) * g)

    dx_ref, dy_ref = jax.grad(f, argnums=(0, 1))(x, y)
    out = _logmatmulexp_xla(x, y)
    dx, dy = _fused_bwd((x, y, out), g)
    assert np.allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=1e-5)


def test_settings_toggle_routes_hot_path(monkeypatch):
    """The settings flag flips DiscreteHMM's _logmatmulexp routing."""
    import pyro_tpu.settings as settings
    from pyro_tpu.ops.pallas import log_einsum

    calls = {"pallas": 0}

    def fake_pallas(x, y, interpret=False):
        calls["pallas"] += 1
        return _logmatmulexp_xla(x, y)

    monkeypatch.setattr(log_einsum, "_logmatmulexp_pallas", fake_pallas)
    monkeypatch.setattr(
        log_einsum.jax, "default_backend", lambda: "tpu"
    )
    x = jnp.zeros((2, 128, 128))
    y = jnp.zeros((2, 128, 128))
    settings.set(pallas_logmatmulexp=False)
    log_einsum.logmatmulexp(x, y)
    assert calls["pallas"] == 0
    settings.set(pallas_logmatmulexp=True)
    try:
        log_einsum.logmatmulexp(x, y)
        assert calls["pallas"] == 1
    finally:
        settings.set(pallas_logmatmulexp=False)
