"""minipyro, randomvariable, bnn, easyguide, autoname tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
from pyro_tpu import poutine
import pyro_tpu.distributions as dist


def test_minipyro_svi():
    from pyro_tpu.contrib import minipyro as mp

    mp.clear_param_store()
    data = jnp.array([1.0, 2.0, 3.0])

    def model():
        loc = mp.param("loc", jnp.zeros(()))
        mp.sample("obs", dist.Normal(loc, 1.0).expand((3,)), obs=data)

    def guide():
        pass

    svi = mp.SVI(model, guide, mp.Adam({"lr": 0.1}), mp.elbo)
    for _ in range(300):
        svi.step()
    assert abs(float(mp.PARAM_STORE["loc"]) - 2.0) < 0.1


def test_minipyro_handlers():
    from pyro_tpu.contrib import minipyro as mp

    def model():
        x = mp.sample("x", dist.Normal(0.0, 1.0))
        y = mp.sample("y", dist.Normal(x, 1.0))
        return y

    tr = mp.trace(mp.seed(model, 0)).get_trace()
    assert set(tr) == {"x", "y"}
    tr2 = mp.trace(mp.replay(mp.seed(model, 9), tr)).get_trace()
    assert np.allclose(tr2["x"]["value"], tr["x"]["value"])


def test_random_variable_arithmetic():
    from pyro_tpu.distributions import Normal

    X = Normal(0.0, 1.0).rv
    Y = (X * 2 + 1).dist
    samples = Y.sample(jax.random.key(0), (20000,))
    assert abs(float(samples.mean()) - 1.0) < 0.05
    assert abs(float(samples.std()) - 2.0) < 0.05
    import scipy.stats as sps

    assert np.allclose(
        float(Y.log_prob(jnp.array(2.0))),
        sps.norm.logpdf(2.0, 1.0, 2.0),
        rtol=1e-4,
    )
    Z = X.exp().dist
    assert np.allclose(
        float(Z.log_prob(jnp.array(1.5))),
        sps.lognorm.logpdf(1.5, 1.0),
        rtol=1e-4,
    )


def test_bnn_hidden_layer():
    from pyro_tpu.contrib.bnn import HiddenLayer

    X = jax.random.normal(jax.random.key(0), (7, 4))
    A_mean = jnp.zeros((4, 5))
    A_scale = 0.3 * jnp.ones((4, 5))
    layer = HiddenLayer(X, A_mean, A_scale)
    h = layer.rsample(jax.random.key(1))
    assert h.shape == (7, 6)  # hidden 5 + bias
    assert np.allclose(np.asarray(h[:, -1]), 1.0)
    kl = layer.log_prob(h)
    assert np.isfinite(float(kl))


def test_easyguide():
    from pyro_tpu.contrib.easyguide import easy_guide
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    data = jnp.array([1.0, 2.0, 3.0])

    def model(data):
        a = pyro.sample("hier_a", dist.Normal(0.0, 10.0))
        b = pyro.sample("hier_b", dist.Normal(0.0, 10.0))
        with pyro.plate("data", 3):
            pyro.sample("obs", dist.Normal(a + b, 1.0), obs=data)

    @easy_guide(model)
    def guide(self, data):
        group = self.group(match="hier_.*")
        loc = pyro.param("joint_loc", jnp.zeros(group.event_shape))
        scale_tril = pyro.param(
            "joint_scale_tril",
            0.1 * jnp.eye(group.event_shape[0]),
            constraint=dist.constraints.lower_cholesky,
        )
        group.sample(
            "joint",
            dist.MultivariateNormal(loc, scale_tril=scale_tril),
        )

    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
    for _ in range(1000):
        svi.step(data)
    loc = np.asarray(pyro.get_param_store()["joint_loc"])
    # a + b should approach 2 (posterior mean of sum)
    assert abs(loc.sum() - 2.0) < 0.3


def test_autoname_scope_and_count():
    from pyro_tpu import poutine
    from pyro_tpu.contrib.autoname import name_count, scope

    @scope(prefix="outer")
    def submodel():
        return pyro.sample("x", dist.Normal(0.0, 1.0))

    tr = poutine.trace(poutine.seed(submodel, 0)).get_trace()
    assert "outer/x" in tr

    @name_count
    def counted():
        pyro.sample("z", dist.Normal(0.0, 1.0))
        pyro.sample("z", dist.Normal(0.0, 1.0))

    tr2 = poutine.trace(poutine.seed(counted, 0)).get_trace()
    assert "z" in tr2 and "z__0" in tr2


def test_conjugate_collapse_and_posterior():
    from pyro_tpu.contrib.conjugate import (
        BetaBinomialPair,
        collapse_conjugate,
        posterior_replay,
    )
    from pyro_tpu import poutine

    data = jnp.array([7.0, 8.0, 6.0])
    n = jnp.array([10.0, 10.0, 10.0])

    def model():
        p = pyro.sample(
            "p", dist.Beta(2.0, 2.0), infer={"collapse": True}
        )
        with pyro.plate("data", 3):
            pyro.sample(
                "obs",
                BetaBinomialPair().compound(p.fn, n),
                obs=data,
            )

    # collapsed model traces without sampling p
    tr = poutine.trace(
        collapse_conjugate(poutine.seed(model, 0))
    ).get_trace()
    tr2 = tr.copy()
    from pyro_tpu.poutine.util import prune_subsample_sites

    # exact marginal likelihood is finite
    obs_site = tr.nodes["obs"]
    assert np.isfinite(
        float(obs_site["fn"].log_prob(obs_site["value"]).sum())
    )
    posts = posterior_replay(model)
    post = posts["p"]
    expected = dist.Beta(2.0 + 21.0, 2.0 + 9.0)
    assert np.allclose(float(post.concentration1), float(expected.concentration1))
    assert np.allclose(float(post.concentration0), float(expected.concentration0))


def test_pyro_module():
    """PyroModule attributes: PyroParam -> store-backed param,
    PyroSample -> per-call-cached sample; SVI recovers the weight."""
    from pyro_tpu.nn import PyroModule, PyroParam, PyroSample
    from pyro_tpu.distributions import constraints
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.infer.autoguide import AutoNormal
    from pyro_tpu.optim import Adam

    pyro.clear_param_store()

    class BayesLinear(PyroModule):
        def __init__(self):
            super().__init__("blin")
            self.scale = PyroParam(
                jnp.asarray(1.0), constraint=constraints.positive
            )
            self.weight = PyroSample(dist.Normal(0.0, 1.0))

        def forward(self, x, y=None):
            w = self.weight
            w2 = self.weight  # cached within a call: same traced value
            assert w is w2
            with pyro.plate("data", x.shape[0]):
                return pyro.sample(
                    "obs", dist.Normal(w * x, self.scale), obs=y
                )

    m = BayesLinear()
    x = jnp.linspace(-1, 1, 20)
    with poutine.seed(rng_key=jax.random.key(0)):
        tr = poutine.trace(lambda: m(x)).get_trace()
    assert "blin.weight" in tr.nodes
    assert "blin.scale" in pyro.get_param_store().keys()
    # fresh draws across calls
    with poutine.seed(rng_key=jax.random.key(1)):
        w1 = poutine.trace(lambda: m(x)).get_trace().nodes["blin.weight"]["value"]
    with poutine.seed(rng_key=jax.random.key(2)):
        w2 = poutine.trace(lambda: m(x)).get_trace().nodes["blin.weight"]["value"]
    assert float(w1) != float(w2)

    y = jnp.asarray(
        2.5 * np.asarray(x) + 0.1 * np.random.RandomState(0).randn(20),
        jnp.float32,
    )
    guide = AutoNormal(lambda x, y: m(x, y))
    svi = SVI(lambda x, y: m(x, y), guide, Adam({"lr": 0.05}), Trace_ELBO())
    for _ in range(800):
        svi.step(x, y)
    assert abs(float(guide.median()["blin.weight"]) - 2.5) < 0.2


def test_masked_linear():
    from pyro_tpu.nn import MaskedLinear

    pyro.clear_param_store()
    mask = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    ml = MaskedLinear("ml", 2, 2, mask, bias=False)
    out = ml(jnp.asarray([[0.0, 7.0]]))
    assert float(out[0, 0]) == 0.0  # masked path contributes nothing


@pytest.mark.stage("integration")
def test_lgssm_gp_noise_model():
    from pyro_tpu.contrib.timeseries import GenericLGSSMWithGPNoiseModel

    pyro.clear_param_store()
    m = GenericLGSSMWithGPNoiseModel(obs_dim=2, state_dim=3)
    y = jnp.asarray(np.random.RandomState(0).randn(25, 2), jnp.float32)
    assert np.isfinite(float(m.log_prob(y)))
    x = m.get_dist(duration=40).rsample(jax.random.key(0))
    assert x.shape == (40, 2)
