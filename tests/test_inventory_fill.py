"""Tests for inventory-completing components: TracePosterior/
EmpiricalMarginal, AutoDiscreteParallel, arrowhead mass matrices,
conditional transforms (mirrors scattered reference tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import (
    SVI,
    EmpiricalMarginal,
    TraceEnum_ELBO,
    TracePosterior,
)
from pyro_tpu.infer.autoguide import AutoDiscreteParallel
from pyro_tpu.infer.mcmc.mass import ArrowheadMassMatrix, BlockMassMatrix
from pyro_tpu.ops.arrowhead import (
    SymmArrowhead,
    sqrt,
    triu_gram,
    triu_inverse,
    triu_matvecmul,
)
from pyro_tpu.optim import Adam


class _PriorPosterior(TracePosterior):
    """Equal-weight prior samples as a TracePosterior."""

    def __init__(self, model, num_samples):
        self.model = model
        self.num_samples = num_samples
        super().__init__()

    def _traces(self, *args, **kwargs):
        for i in range(self.num_samples):
            tr = poutine.trace(
                poutine.seed(self.model, jax.random.key(i))
            ).get_trace(*args, **kwargs)
            yield tr, jnp.asarray(0.0)


def test_trace_posterior_and_empirical_marginal():
    def model():
        x = pyro.sample("x", dist.Normal(2.0, 0.5))
        return x

    post = _PriorPosterior(model, 500).run()
    marg = EmpiricalMarginal(post, sites="x")
    samples = np.asarray(marg.samples)
    assert abs(samples.mean() - 2.0) < 0.1
    assert abs(samples.std() - 0.5) < 0.1
    # marginal() helper
    m = post.marginal(sites=["x"]).empirical["x"]
    assert abs(float(m.mean) - 2.0) < 0.1


def test_trace_posterior_information_criterion():
    data = jnp.asarray([1.0, 2.0, 3.0])

    def model():
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("data", 3):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    post = _PriorPosterior(model, 100).run()
    ic = post.information_criterion()
    assert np.isfinite(float(ic["waic"]))
    assert float(ic["p_waic"]) > 0


def test_auto_discrete_parallel_matches_exact():
    pyro.clear_param_store()
    mus = jnp.asarray([-2.0, 2.0])

    def model():
        z = pyro.sample(
            "z", dist.Categorical(probs=jnp.asarray([0.5, 0.5]))
        )
        pyro.sample("x", dist.Normal(mus[z], 1.0), obs=jnp.asarray(1.5))

    guide = AutoDiscreteParallel(model)
    svi = SVI(model, guide, Adam({"lr": 0.1}), TraceEnum_ELBO(max_plate_nesting=0))
    for _ in range(300):
        svi.step()
    probs = np.asarray(
        pyro.get_param_store()["AutoDiscreteParallel.z_probs"]
    )
    w = np.asarray(
        [
            scipy.stats.norm.pdf(1.5, -2, 1),
            scipy.stats.norm.pdf(1.5, 2, 1),
        ]
    )
    w = w / w.sum()
    assert np.allclose(probs, w, atol=0.02), (probs, w)


def _dense_arrowhead(m):
    head = m.top.shape[0]
    n = m.top.shape[1]
    dense = np.zeros((n, n))
    dense[:head] = np.asarray(m.top)
    dense[:, :head] = np.asarray(m.top).T
    dense[head:, head:] = np.diag(np.asarray(m.bottom_diag))
    return dense


def _dense_triu(t):
    head = t.top.shape[0]
    n = t.top.shape[1]
    U = np.zeros((n, n))
    U[:head] = np.asarray(t.top)
    U[head:, head:] = np.diag(np.asarray(t.bottom_diag))
    return U


def test_arrowhead_algebra():
    rng = np.random.RandomState(0)
    head, n = 3, 8
    A = rng.randn(head, head)
    A = A @ A.T + np.eye(head) * 2
    B = rng.randn(head, n - head) * 0.3
    D = rng.rand(n - head) + 1.0
    m = SymmArrowhead(
        jnp.asarray(np.concatenate([A, B], -1)), jnp.asarray(D)
    )
    dense = _dense_arrowhead(m)
    s = sqrt(m)
    U = _dense_triu(s)
    assert np.allclose(U @ U.T, dense, atol=1e-4)
    si = triu_inverse(s)
    Ui = _dense_triu(si)
    assert np.allclose(Ui @ U, np.eye(n), atol=1e-4)
    assert np.allclose(np.asarray(triu_gram(si)), Ui.T @ Ui, atol=1e-4)
    y = rng.randn(n)
    assert np.allclose(
        np.asarray(triu_matvecmul(s, jnp.asarray(y))), U @ y, atol=1e-4
    )
    assert np.allclose(
        np.asarray(triu_matvecmul(s, jnp.asarray(y), transpose=True)),
        U.T @ y,
        atol=1e-4,
    )


def test_mass_matrix_adapters():
    rng = np.random.RandomState(1)
    am = ArrowheadMassMatrix(head_size=2)
    am.configure(5)
    for _ in range(100):
        am.update(None, jnp.asarray(rng.randn(5)))
    am.end_adaptation()
    inv = np.asarray(am.inverse_mass_matrix)
    r = rng.randn(5)
    assert np.allclose(
        np.asarray(am.kinetic_grad(jnp.asarray(r))), inv @ r, atol=1e-4
    )
    # scale/unscale roundtrip
    assert np.allclose(
        np.asarray(am.unscale(am.scale(jnp.asarray(r)))), r, atol=1e-4
    )

    bm = BlockMassMatrix()
    bm.configure(4, diagonal=False)
    for _ in range(100):
        bm.update(jnp.asarray(rng.randn(4)))
    bm.end_adaptation()
    r4 = jnp.asarray(rng.randn(4))
    assert np.allclose(
        np.asarray(bm.unscale(bm.scale(r4))), np.asarray(r4), atol=1e-4
    )
    # kinetic_grad consistency: M^-1 == (M^-1/2)^T M^-1/2 in our convention
    inv4 = np.asarray(bm.inverse_mass_matrix)
    assert np.allclose(
        np.asarray(bm.kinetic_grad(r4)), inv4 @ np.asarray(r4), atol=1e-4
    )


def test_funsor_frontend_is_native():
    """contrib.funsor was an ImportError gate through round 4; it is now
    a native named-tensor term algebra (terms/runtime/primitives) plus
    the backend namespace (see tests/test_funsor.py for semantics)."""
    import pyro_tpu.contrib.funsor as funsor

    assert callable(funsor.to_funsor) and callable(funsor.to_data)
    assert funsor.Tensor is not None and funsor.Variable is not None
    from pyro_tpu.contrib.pyroapi import _BACKENDS

    assert "contrib.funsor" in _BACKENDS
