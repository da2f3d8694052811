"""Reparameterizer tests: reparameterized models preserve posteriors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
from pyro_tpu.infer.reparam import (
    AutoReparam,
    DiscreteCosineReparam,
    HaarReparam,
    LocScaleReparam,
    MinimalReparam,
    TransformReparam,
)
from pyro_tpu.optim import Adam


def test_loc_scale_reparam_sites():
    def model():
        x = pyro.sample("x", dist.Normal(1.0, 2.0))
        pyro.sample("y", dist.Normal(x, 1.0), obs=jnp.array(2.0))

    reparam_model = poutine.reparam(
        model, config={"x": LocScaleReparam(centered=0.0)}
    )
    tr = poutine.trace(poutine.seed(reparam_model, 0)).get_trace()
    assert "x_decentered" in tr
    assert tr.nodes["x"]["is_observed"]  # deterministic reconstruction
    # decentered prior is standard normal
    fn = tr.nodes["x_decentered"]["fn"]
    assert np.allclose(float(fn.mean), 0.0)
    assert np.allclose(float(fn.variance), 1.0)


def test_loc_scale_reparam_preserves_posterior():
    """Eight-schools-style funnel: reparam NUTS matches non-centered."""
    y = jnp.array([5.0, -3.0, 2.0])

    def model():
        mu = pyro.sample("mu", dist.Normal(0.0, 5.0))
        tau = pyro.sample("tau", dist.HalfCauchy(3.0))
        with pyro.plate("J", 3):
            theta = pyro.sample("theta", dist.Normal(mu, tau))
            pyro.sample("obs", dist.Normal(theta, 2.0), obs=y)

    reparam_model = poutine.reparam(
        model, config={"theta": LocScaleReparam(centered=0.0)}
    )
    mcmc = MCMC(NUTS(reparam_model), num_samples=600, warmup_steps=600, num_chains=2)
    mcmc.run(rng_key=jax.random.key(0))
    s = mcmc.get_samples()
    assert "theta_decentered" in s
    diag = mcmc.diagnostics()
    assert diag["divergences"]["total"] < 30


def test_transform_reparam():
    def model():
        x = pyro.sample("x", dist.LogNormal(0.0, 1.0))
        pyro.sample("y", dist.Normal(x, 1.0), obs=jnp.array(1.5))

    reparam_model = poutine.reparam(model, config={"x": TransformReparam()})
    tr = poutine.trace(poutine.seed(reparam_model, 0)).get_trace()
    assert "x_base" in tr
    # value is exp of base
    assert np.allclose(
        np.asarray(tr.nodes["x"]["value"]),
        np.exp(np.asarray(tr.nodes["x_base"]["value"])),
        rtol=1e-5,
    )


@pytest.mark.parametrize("reparam_cls", [HaarReparam, DiscreteCosineReparam])
def test_frequency_reparams_preserve_logdensity(reparam_cls):
    """Orthonormal transforms: reparam model has identical log joint."""
    T = 8
    data = jax.random.normal(jax.random.key(1), (T,))

    def model():
        drift = pyro.sample(
            "drift", dist.Normal(jnp.zeros(T), 1.0).to_event(1)
        )
        pyro.sample("obs", dist.Normal(drift, 0.5).to_event(1), obs=data)

    base_tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    base_tr.compute_log_prob()

    rmodel = poutine.reparam(model, config={"drift": reparam_cls()})
    tr = poutine.trace(poutine.seed(rmodel, 0)).get_trace()
    tr.compute_log_prob()
    # joint density of (aux, obs) should match (drift, obs) at the
    # corresponding point since the transform is orthonormal
    suffix = "haar" if reparam_cls is HaarReparam else "dct"
    aux = tr.nodes[f"drift_{suffix}"]
    drift_value = tr.nodes["drift"]["value"]
    lp_aux = float(aux["log_prob_sum"])
    lp_direct = float(
        dist.Normal(jnp.zeros(T), 1.0).to_event(1).log_prob(drift_value)
    )
    assert np.allclose(lp_aux, lp_direct, rtol=1e-4), (lp_aux, lp_direct)


def test_auto_reparam_strategy():
    def model():
        x = pyro.sample("x", dist.LogNormal(0.0, 1.0))
        z = pyro.sample("z", dist.Normal(x, 2.0))
        pyro.sample("y", dist.Normal(z, 1.0), obs=jnp.array(1.5))

    strategy = AutoReparam()
    rmodel = poutine.reparam(model, config=strategy)
    tr = poutine.trace(poutine.seed(rmodel, 0)).get_trace()
    assert "x_base" in tr  # TransformReparam for LogNormal
    assert "z_decentered" in tr  # LocScaleReparam for Normal

    # MinimalReparam only transforms
    pyro.clear_param_store()
    tr2 = poutine.trace(
        poutine.seed(poutine.reparam(model, config=MinimalReparam()), 0)
    ).get_trace()
    assert "x_base" in tr2
    assert "z_decentered" not in tr2


def test_conjugate_reparam_exact_posterior():
    """With the exact conjugate likelihood as guide, the reparameterized
    site samples directly from the exact posterior (ref conjugate.py)."""
    from pyro_tpu.infer.reparam import ConjugateReparam

    total, count = 10.0, 2.0

    def model():
        prob = pyro.sample("prob", dist.Beta(0.5, 1.5))
        pyro.sample(
            "count",
            dist.Binomial(total, probs=prob),
            obs=jnp.asarray(count),
        )

    lik = dist.Beta(1 + count, 1 + total - count)
    reparam_model = poutine.reparam(
        model, config={"prob": ConjugateReparam(lik)}
    )
    vals = []
    for i in range(1500):
        tr = poutine.trace(
            poutine.seed(reparam_model, jax.random.key(i))
        ).get_trace()
        vals.append(float(tr.nodes["prob"]["value"]))
    exact = dist.Beta(0.5 + count, 1.5 + total - count)
    assert abs(np.mean(vals) - float(exact.mean)) < 0.02


def test_conjugate_update_fusion_identity():
    for p, q in [
        (dist.Beta(2.0, 3.0), dist.Beta(4.0, 1.5)),
        (dist.Gamma(2.0, 3.0), dist.Gamma(1.5, 0.5)),
    ]:
        u, ln = p.conjugate_update(q)
        z = jnp.asarray(0.37)
        assert np.allclose(
            float(p.log_prob(z) + q.log_prob(z)),
            float(u.log_prob(z) + ln),
            atol=1e-5,
        )
    pd = dist.Dirichlet(jnp.asarray([2.0, 3.0, 1.5]))
    qd = dist.Dirichlet(jnp.asarray([1.2, 2.0, 4.0]))
    u, ln = pd.conjugate_update(qd)
    z = jnp.asarray([0.2, 0.3, 0.5])
    assert np.allclose(
        float(pd.log_prob(z) + qd.log_prob(z)),
        float(u.log_prob(z) + ln),
        atol=1e-5,
    )


def test_structured_reparam_preconditions_nuts():
    from pyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
    from pyro_tpu.infer.autoguide import AutoStructured
    from pyro_tpu.infer.reparam import StructuredReparam
    from pyro_tpu.optim import Adam

    pyro.clear_param_store()

    def corr_model():
        a = pyro.sample("a", dist.Normal(0.0, 1.0))
        b = pyro.sample("b", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(a + b, 0.3), obs=jnp.asarray(1.0))

    guide = AutoStructured(corr_model)
    svi = SVI(
        corr_model, guide, Adam({"lr": 0.02}), Trace_ELBO(num_particles=8)
    )
    for _ in range(1000):
        svi.step()
    rep = StructuredReparam(guide)
    mcmc = MCMC(
        NUTS(rep.reparam(corr_model)), num_samples=200, warmup_steps=200
    )
    mcmc.run(rng_key=jax.random.key(1))
    s = mcmc.get_samples()
    assert set(s) == {"a_aux", "b_aux"}
    assert np.isfinite(np.asarray(s["a_aux"])).all()
