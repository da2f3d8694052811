"""Dedicated numerical-ops tests (mirrors ``/root/reference/tests/ops/``:
welford, dual averaging, Vindex, newton, special fns, stats, streaming,
integrator, provenance, tensor utils)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special as sp
from scipy import stats as st


# -- welford ----------------------------------------------------------------


@pytest.mark.parametrize("diagonal", [True, False])
def test_welford_matches_numpy(diagonal):
    from pyro_tpu.ops.welford import (
        welford_covariance,
        welford_init,
        welford_update,
    )

    rng = np.random.RandomState(0)
    xs = rng.randn(500, 4) * np.asarray([1.0, 2.0, 0.5, 3.0])
    state = welford_init(4, diagonal=diagonal)
    for x in xs:
        state = welford_update(state, jnp.asarray(x))
    cov = np.asarray(welford_covariance(state, regularize=False))
    if diagonal:
        expected = xs.var(0, ddof=1)
    else:
        expected = np.cov(xs.T, ddof=1)
    assert np.allclose(cov, expected, rtol=1e-4), (cov, expected)


# -- dual averaging ---------------------------------------------------------


def test_dual_averaging_drives_statistic_to_zero():
    """Feeding g = (target - actual) acceptance-style statistics, the
    averaged iterate converges so the statistic vanishes (the Nesterov
    scheme of ref ``ops/dual_averaging.py``)."""
    from pyro_tpu.ops.dual_averaging import da_init, da_step

    state = da_init(prox_center=jnp.log(10.0))
    # pretend true optimum is log(2): statistic positive when below
    for _ in range(200):
        x = state.x_avg
        g = jnp.tanh(float(x) - np.log(2.0))  # grad-like signal
        state = da_step(state, g)
    assert abs(float(state.x_avg) - np.log(2.0)) < 0.2


# -- Vindex -----------------------------------------------------------------


def test_vindex_matches_reference_semantics():
    from pyro_tpu.ops.indexing import Vindex

    rng = np.random.RandomState(1)
    p = jnp.asarray(rng.rand(3, 4, 5))
    # batched index over the middle dim; index batch (7, 1) broadcasts
    # against p's leading batch (3,) -> result (7, 3, 5)
    i = jnp.asarray(rng.randint(0, 4, size=(7, 1)))
    out = Vindex(p)[..., i, :]
    assert out.shape == (7, 3, 5), out.shape
    out_np = np.asarray(out)
    for a in range(7):
        for b in range(3):
            expected = np.asarray(p)[b, int(i[a, 0]), :]
            assert np.allclose(out_np[a, b], expected)


def test_vindex_trailing_ellipsis_cases():
    from pyro_tpu.ops.indexing import Vindex

    x = jnp.arange(24.0).reshape(2, 3, 4)
    z = jnp.asarray([[0, 1], [2, 0]])  # (2, 2)
    out = Vindex(x)[..., z, :]
    # reference semantics (verified vs torch pyro): z's batch broadcasts
    # against x's leading batch -> (2, 2, 4) with
    # result[i, j] = x[j, z[i, j], :]
    assert out.shape == (2, 2, 4)
    for i in range(2):
        for j in range(2):
            assert np.allclose(
                np.asarray(out)[i, j],
                np.asarray(x)[j, int(z[i, j]), :],
            )


# -- newton -----------------------------------------------------------------


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_newton_step_exact_on_quadratic(dim):
    from pyro_tpu.ops.newton import newton_step

    rng = np.random.RandomState(dim)
    A = rng.randn(dim, dim)
    A = A @ A.T + dim * np.eye(dim)
    b = rng.randn(dim)
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    def loss(x):
        return 0.5 * x @ A_j @ x - b_j @ x

    x0 = jnp.asarray(rng.randn(dim))
    x1, cov = newton_step(loss, x0)
    expected = np.linalg.solve(A, b)
    assert np.allclose(np.asarray(x1), expected, atol=1e-4)
    # returned covariance is the inverse Hessian
    assert np.allclose(np.asarray(cov), np.linalg.inv(A), atol=1e-4)


# -- special ----------------------------------------------------------------


def test_special_functions_vs_scipy():
    from pyro_tpu.ops.special import (
        log_beta,
        log_binomial,
        log_i0,
        log_i1,
        safe_log,
    )

    xs = jnp.asarray([0.5, 1.0, 2.5, 10.0])
    ys = jnp.asarray([1.5, 2.0, 0.3, 4.0])
    assert np.allclose(
        np.asarray(log_beta(xs, ys)),
        sp.betaln(np.asarray(xs), np.asarray(ys)),
        rtol=1e-5,
    )
    n, k = jnp.asarray([10.0, 20.0]), jnp.asarray([3.0, 7.0])
    assert np.allclose(
        np.asarray(log_binomial(n, k)),
        np.log(sp.comb(np.asarray(n), np.asarray(k))),
        rtol=1e-5,
    )
    v = jnp.asarray([0.1, 1.0, 5.0])
    assert np.allclose(
        np.asarray(log_i0(v)), np.log(sp.i0(np.asarray(v))), rtol=1e-4
    )
    assert np.allclose(
        np.asarray(log_i1(v)), np.log(sp.i1(np.asarray(v))), rtol=1e-4
    )
    assert np.isfinite(float(safe_log(jnp.asarray(0.0))))


def test_sparse_multinomial_likelihood():
    from pyro_tpu.ops.special import sparse_multinomial_likelihood

    logits = jnp.log(jnp.asarray([0.2, 0.3, 0.5]))
    counts = jnp.asarray([1.0, 2.0, 3.0])
    expected = st.multinomial.logpmf(
        np.asarray(counts), 6, np.asarray([0.2, 0.3, 0.5])
    )
    actual = float(
        sparse_multinomial_likelihood(6.0, logits, counts)
    )
    assert np.allclose(actual, expected, rtol=1e-5)


# -- stats ------------------------------------------------------------------


def test_autocorrelation_white_noise():
    from pyro_tpu.ops.stats import autocorrelation

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4000))
    ac = np.asarray(autocorrelation(x))
    assert abs(ac[0] - 1.0) < 1e-5
    assert np.abs(ac[1:50]).max() < 0.1


def test_quantile_pi_hpdi():
    from pyro_tpu.ops.stats import hpdi, pi, quantile

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(20000))
    q = np.asarray(quantile(x, jnp.asarray([0.25, 0.5, 0.75])))
    expected = np.quantile(np.asarray(x), [0.25, 0.5, 0.75])
    assert np.allclose(q, expected, atol=0.03)
    lo, hi = np.asarray(pi(x, 0.9))
    assert abs(lo - st.norm.ppf(0.05)) < 0.06
    assert abs(hi - st.norm.ppf(0.95)) < 0.06
    lo, hi = np.asarray(hpdi(x, 0.9))
    # for a symmetric density hpdi ~ equal-tailed interval
    assert abs(lo - st.norm.ppf(0.05)) < 0.12
    assert abs(hi - st.norm.ppf(0.95)) < 0.12


def test_gelman_rubin_mixed_vs_stuck():
    from pyro_tpu.ops.stats import split_gelman_rubin

    rng = np.random.RandomState(5)
    mixed = jnp.asarray(rng.randn(4, 1000))
    rhat = float(split_gelman_rubin(mixed))
    assert abs(rhat - 1.0) < 0.05
    stuck = jnp.asarray(rng.randn(4, 1000) + np.arange(4)[:, None] * 5)
    rhat_bad = float(split_gelman_rubin(stuck))
    assert rhat_bad > 1.5


# -- streaming --------------------------------------------------------------


def test_streaming_stats_merge_equals_batch():
    from pyro_tpu.ops.streaming import CountMeanVarianceStats

    rng = np.random.RandomState(6)
    xs = rng.randn(100)
    a, b = CountMeanVarianceStats(), CountMeanVarianceStats()
    for x in xs[:60]:
        a.update(jnp.asarray(x))
    for x in xs[60:]:
        b.update(jnp.asarray(x))
    merged = a.merge(b)
    got = merged.get()
    assert got["count"] == 100
    assert np.allclose(float(got["mean"]), xs.mean(), rtol=1e-5)
    assert np.allclose(
        float(got["variance"]), xs.var(ddof=1), rtol=1e-4
    )


# -- integrator -------------------------------------------------------------


def test_velocity_verlet_energy_conservation():
    from pyro_tpu.ops.integrator import velocity_verlet

    def potential(z):
        return 0.5 * jnp.sum(z["x"] ** 2)

    z = {"x": jnp.asarray([1.0, -0.5])}
    r = {"x": jnp.asarray([0.3, 0.7])}

    def energy(z, r):
        return float(
            potential(z) + 0.5 * jnp.sum(r["x"] ** 2)
        )

    e0 = energy(z, r)
    z_new, r_new, _, _ = velocity_verlet(
        z,
        r,
        potential,
        lambda r: r,  # unit mass: dK/dr = r
        step_size=0.01,
        num_steps=500,
    )
    e1 = energy(z_new, r_new)
    assert abs(e1 - e0) < 1e-3 * max(1.0, abs(e0)), (e0, e1)


# -- provenance -------------------------------------------------------------


def test_provenance_tracks_dependencies():
    from pyro_tpu.ops.provenance import get_provenance, track_provenance

    def fn(inputs):
        a, b, c = inputs["a"], inputs["b"], inputs["c"]
        return {"x": a * 2 + b, "y": c**2, "z": jnp.asarray(1.0)}

    deps = track_provenance(
        fn,
        {
            "a": jnp.asarray(1.0),
            "b": jnp.asarray(2.0),
            "c": jnp.asarray(3.0),
        },
    )
    assert get_provenance(deps, "x") == frozenset({"a", "b"})
    assert get_provenance(deps, "y") == frozenset({"c"})
    assert get_provenance(deps, "z") == frozenset()


# -- tensor utils -----------------------------------------------------------


def test_tensor_utils():
    from pyro_tpu.ops.tensor_utils import (
        block_diag_embed,
        convolve,
        dct,
        idct,
        next_fast_len,
        repeated_matmul,
    )

    m = jnp.asarray(np.random.RandomState(7).randn(3, 2, 2))
    bd = np.asarray(block_diag_embed(m))
    assert bd.shape == (6, 6)
    assert np.allclose(bd[2:4, 2:4], np.asarray(m)[1])
    assert np.allclose(bd[0:2, 2:4], 0.0)

    a = jnp.asarray([1.0, 2.0, 3.0])
    b = jnp.asarray([0.5, 1.0])
    assert np.allclose(
        np.asarray(convolve(a, b, mode="full")),
        np.convolve(np.asarray(a), np.asarray(b)),
        atol=1e-5,
    )

    assert next_fast_len(17) >= 17

    M = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    reps = np.asarray(repeated_matmul(M, 5))
    expected = np.stack(
        [np.linalg.matrix_power(np.asarray(M), k) for k in range(1, 6)]
    )
    assert np.allclose(reps, expected, atol=1e-5)

    x = jnp.asarray(np.random.RandomState(8).randn(16))
    assert np.allclose(
        np.asarray(idct(dct(x))), np.asarray(x), atol=1e-4
    )


def test_special_precision_scales_with_dtype():
    """log_beta / log_binomial against scipy at dtype-scaled tolerance:
    ~1e-12 under PYRO_TPU_X64=1, ~1e-5 in f32."""
    import os

    from scipy import special as sp

    from pyro_tpu.ops.special import log_beta, log_binomial

    x64 = os.environ.get("PYRO_TPU_X64") == "1"
    rtol = 1e-12 if x64 else 1e-5
    x = jnp.array([0.5, 1.0, 3.7, 12.0, 55.0])
    y = jnp.array([1.5, 2.0, 0.9, 30.0, 2.5])
    np.testing.assert_allclose(
        np.asarray(log_beta(x, y)),
        sp.betaln(np.asarray(x), np.asarray(y)),
        rtol=rtol,
    )
    n = jnp.array([10.0, 20.0, 50.0])
    k = jnp.array([3.0, 10.0, 25.0])
    np.testing.assert_allclose(
        np.asarray(log_binomial(n, k)),
        np.log(sp.comb(np.asarray(n), np.asarray(k))),
        rtol=max(rtol, 1e-6) if not x64 else rtol,
    )
