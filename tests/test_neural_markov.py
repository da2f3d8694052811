"""NormalMarkovChain: single-site autoregressive Gaussian chains.

The vectorized-trace form of the DMM's per-step sample loop
(ref ``examples/dmm.py:287-310``): its ``log_prob`` must equal the sum
of the unrolled per-step Normal log-probs exactly, and its ``rsample``
must reproduce the ancestral loop draw for the same white noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions.neural_markov import NormalMarkovChain

B, T, Z, K = 3, 7, 4, 5


def _cond(z_prev, x_t):
    """Deterministic nonlinear conditioner (broadcasts over leading dims)."""
    w = jnp.linspace(-0.5, 0.5, Z * Z).reshape(Z, Z)
    loc = jnp.tanh(z_prev @ w)
    if x_t is not None:
        v = jnp.linspace(0.1, 0.3, K * Z).reshape(K, Z)
        loc = loc + x_t @ v
    scale = 0.5 + 0.4 * jax.nn.sigmoid(z_prev.sum(-1, keepdims=True))
    return loc, jnp.broadcast_to(scale, loc.shape)


@pytest.mark.parametrize("with_xs", [False, True])
def test_log_prob_equals_unrolled(with_xs):
    xs = (
        jax.random.normal(jax.random.key(0), (B, T, K)) if with_xs else None
    )
    z0 = jax.random.normal(jax.random.key(1), (B, Z))
    d = NormalMarkovChain(_cond, z0, length=T, xs=xs)
    assert d.batch_shape == (B,) and d.event_shape == (T, Z)
    value = jax.random.normal(jax.random.key(2), (B, T, Z))

    lp = d.log_prob(value)

    expected = jnp.zeros(B)
    z_prev = z0
    for t in range(T):
        x_t = None if xs is None else xs[:, t]
        loc, scale = _cond(z_prev, x_t)
        expected = expected + (
            dist.Normal(loc, scale).to_event(1).log_prob(value[:, t])
        )
        z_prev = value[:, t]
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("with_xs", [False, True])
def test_rsample_equals_ancestral_loop(with_xs):
    xs = (
        jax.random.normal(jax.random.key(3), (B, T, K)) if with_xs else None
    )
    z0 = jax.random.normal(jax.random.key(4), (B, Z))
    d = NormalMarkovChain(_cond, z0, length=T, xs=xs)
    key = jax.random.key(5)
    z = d.rsample(key)
    assert z.shape == (B, T, Z)

    # replicate: same single white-noise draw, explicit Python loop
    eps = jax.random.normal(key, (B, T, Z))
    z_prev, draws = z0, []
    for t in range(T):
        x_t = None if xs is None else xs[:, t]
        loc, scale = _cond(z_prev, x_t)
        z_t = loc + scale * eps[:, t]
        draws.append(z_t)
        z_prev = z_t
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(jnp.stack(draws, axis=1)),
        rtol=1e-5, atol=1e-5,
    )
    # the draw scores finitely under its own density
    assert np.isfinite(np.asarray(d.log_prob(z))).all()


def test_sample_shape_and_grad():
    z0 = jnp.zeros((B, Z))
    d = NormalMarkovChain(_cond, z0, length=T)
    z = d.rsample(jax.random.key(6), sample_shape=(2,))
    assert z.shape == (2, B, T, Z)

    def loss(z0):
        dd = NormalMarkovChain(_cond, z0, length=T)
        zz = dd.rsample(jax.random.key(7))
        return (zz**2).sum() - dd.log_prob(zz).sum()

    g = jax.grad(loss)(jnp.ones((B, Z)))
    assert np.isfinite(np.asarray(g)).all()


def test_transforms_change_of_variables():
    from pyro_tpu.distributions.transforms import ExpTransform

    z0 = jnp.zeros((B, Z))
    tr = ExpTransform()
    d = NormalMarkovChain(_cond, z0, length=T, transforms=[tr])
    key = jax.random.key(8)
    z = d.rsample(key)
    assert (np.asarray(z) > 0).all()

    # unrolled comparison: conditioner consumes the TRANSFORMED z_prev
    eps = jax.random.normal(key, (B, T, Z))
    z_prev, lp = z0, jnp.zeros(B)
    draws = []
    for t in range(T):
        loc, scale = _cond(z_prev, None)
        base = loc + scale * eps[:, t]
        z_t = jnp.exp(base)
        draws.append(z_t)
        z_prev = z_t
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(jnp.stack(draws, axis=1)),
        rtol=1e-5, atol=1e-5,
    )
    # log_prob: base normal minus log|det| = sum log z (for exp)
    z_prev = z0
    for t in range(T):
        loc, scale = _cond(z_prev, None)
        zt = jnp.stack(draws, axis=1)[:, t]
        lp = lp + dist.Normal(loc, scale).to_event(1).log_prob(
            jnp.log(zt)
        ) - jnp.log(zt).sum(-1)
        z_prev = zt
    np.testing.assert_allclose(
        np.asarray(d.log_prob(z)), np.asarray(lp), rtol=1e-5, atol=1e-5
    )


def test_dmm_vectorized_elbo_runs(monkeypatch):
    """The rebuilt DMM (one-site chain) trains: ELBO finite and
    decreasing-ish on tiny shapes, via the public SVI API."""
    import examples.dmm as dmm
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import ClippedAdam

    pyro.clear_param_store()
    from pyro_tpu.nn import clear_module_registry

    clear_module_registry()
    data = dmm.synthetic_data(jax.random.key(0), 2, 5)
    svi = SVI(
        dmm.model,
        dmm.guide,
        ClippedAdam({"lr": 1e-3, "clip_norm": 10.0}),
        Trace_ELBO(),
    )
    losses = [float(svi.step(data, 1.0)) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses), losses


def test_dmm_model_logjoint_matches_unrolled():
    """The one-site DMM model's log-joint at a fixed z equals the
    reference factorization sum_t log p(z_t | z_{t-1}) + log p(x_t | z_t)
    computed by an explicit loop with the same networks."""
    import examples.dmm as dmm
    from pyro_tpu import poutine

    pyro.clear_param_store()
    from pyro_tpu.nn import clear_module_registry

    clear_module_registry()
    Bd, Td = 2, 4
    data = dmm.synthetic_data(jax.random.key(1), Bd, Td)
    z_fix = 0.3 * jax.random.normal(
        jax.random.key(2), (Bd, Td, dmm.Z_DIM)
    )
    with poutine.trace() as tr:
        with poutine.condition(data={"z": z_fix}):
            dmm.model(data)
    lj = float(tr.trace.log_prob_sum())

    # unrolled reference factorization with the SAME trained modules
    from pyro_tpu.nn import flax_module

    trans = flax_module(
        "transition", dmm.GatedTransition(), jnp.zeros((1, dmm.Z_DIM))
    )
    emitter = flax_module(
        "emitter", dmm.Emitter(), jnp.zeros((1, dmm.Z_DIM))
    )
    z_0 = pyro.param("z_0")
    z_prev = jnp.broadcast_to(z_0, (Bd, dmm.Z_DIM))
    total = 0.0
    for t in range(Td):
        loc, scale = trans(z_prev)
        total = total + float(
            dist.Normal(loc, scale).to_event(1).log_prob(z_fix[:, t]).sum()
        )
        logits = emitter(z_fix[:, t])
        total = total + float(
            dist.Bernoulli(logits=logits).log_prob(data[:, t]).sum()
        )
        z_prev = z_fix[:, t]
    np.testing.assert_allclose(lj, total, rtol=1e-4)
