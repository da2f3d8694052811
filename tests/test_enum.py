"""Enumeration correctness (mirrors ``tests/infer/test_enum.py``: compare
enumerated ELBOs against hand-computed exact values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import logsumexp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import SVI, TraceEnum_ELBO, config_enumerate
from pyro_tpu.ops.contract import naive_ubersum, ubersum
from pyro_tpu.ops.indexing import Vindex
from pyro_tpu.optim import Adam

KEY = jax.random.key(0)


def test_ubersum_matches_naive():
    k1, k2, k3 = jax.random.split(KEY, 3)
    x = jax.random.normal(k1, (3, 4))
    y = jax.random.normal(k2, (4, 5))
    z = jax.random.normal(k3, (5,))
    (actual,) = ubersum("ab,bc,c->a", x, y, z)
    (expected,) = naive_ubersum("ab,bc,c->a", x, y, z)
    assert np.allclose(actual, expected, rtol=1e-4)


def test_ubersum_plates_product():
    """Plated factor product-reduces over the plate: log Z = sum_i log Z_i."""
    k = jax.random.key(3)
    x = jax.random.normal(k, (4, 3))  # plate i, enum a
    (actual,) = ubersum("ia->", x, plates="i")
    expected = np.sum(
        np.asarray(logsumexp(x, axis=-1))
    )  # independent per plate slice
    assert np.allclose(float(actual), expected, rtol=1e-4)


def _mixture_model_marginal(probs, locs, data):
    """log p(data) for a categorical mixture, computed by hand."""
    lps = np.log(np.asarray(probs))[None, :] + np.asarray(
        dist.Normal(jnp.asarray(locs)[None, :], 1.0).log_prob(
            jnp.asarray(data)[:, None]
        )
    )
    return float(np.sum(logsumexp(lps, axis=-1)))


def test_model_side_enumeration_exact_marginal():
    """With an empty guide, -TraceEnum_ELBO == exact log marginal."""
    probs = jnp.array([0.25, 0.75])
    locs = jnp.array([-1.0, 2.0])
    data = jnp.array([0.5, -0.5, 2.5])

    def model():
        with pyro.plate("data", 3):
            z = pyro.sample(
                "z",
                dist.Categorical(probs=probs),
                infer={"enumerate": "parallel"},
            )
            pyro.sample("obs", dist.Normal(locs[z], 1.0), obs=data)

    def guide():
        pass

    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    loss = float(elbo.loss(model, guide, rng_key=KEY))
    expected = -_mixture_model_marginal(probs, locs, data)
    assert np.allclose(loss, expected, rtol=1e-4), (loss, expected)


def test_guide_side_enumeration_exact():
    """Enumerated guide: ELBO computed exactly as sum over support."""
    p_model = 0.3
    q_guide = 0.6
    data = jnp.array(1.0)

    def model():
        z = pyro.sample("z", dist.Bernoulli(probs=p_model))
        pyro.sample("obs", dist.Normal(z, 1.0), obs=data)

    def guide():
        pyro.sample(
            "z",
            dist.Bernoulli(probs=q_guide),
            infer={"enumerate": "parallel"},
        )

    elbo = TraceEnum_ELBO(max_plate_nesting=0)
    loss = float(elbo.loss(model, guide, rng_key=KEY))
    # exact ELBO = sum_z q(z) [log p(z) + log p(x|z) - log q(z)]
    expected = 0.0
    for z, q in [(0.0, 1 - q_guide), (1.0, q_guide)]:
        log_pz = np.log(p_model if z else 1 - p_model)
        log_px = float(dist.Normal(z, 1.0).log_prob(data))
        log_qz = np.log(q)
        expected += q * (log_pz + log_px - log_qz)
    assert np.allclose(loss, -expected, rtol=1e-4), (loss, -expected)


def test_markov_chain_matches_discrete_hmm():
    """Sequential pyro.markov enumeration == DiscreteHMM exact log_prob."""
    T, S = 6, 3
    k1, k2, k3 = jax.random.split(KEY, 3)
    init_logits = jax.random.normal(k1, (S,))
    trans_logits = jax.random.normal(k2, (S, S))
    locs = jnp.arange(float(S))
    data = jax.random.normal(k3, (T,))

    def model():
        z = pyro.sample(
            "z_init",
            dist.Categorical(logits=init_logits),
            infer={"enumerate": "parallel"},
        )
        for t in pyro.markov(range(T)):
            z = pyro.sample(
                f"z_{t}",
                dist.Categorical(logits=trans_logits[z]),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(f"x_{t}", dist.Normal(locs[z], 1.0), obs=data[t])

    def guide():
        pass

    elbo = TraceEnum_ELBO(max_plate_nesting=0)
    loss = float(elbo.loss(model, guide, rng_key=KEY))

    hmm = dist.DiscreteHMM(
        init_logits,
        trans_logits,
        dist.Normal(locs, 1.0).expand((1, S)),
        duration=T,
    )
    expected = -float(hmm.log_prob(data))
    assert np.allclose(loss, expected, rtol=1e-4), (loss, expected)


def test_enum_dims_bounded_by_markov():
    """markov recycles enum dims: max dims used stays O(history), not O(T)."""
    T, S = 20, 2

    def model():
        z = pyro.sample(
            "z_init",
            dist.Categorical(logits=jnp.zeros(S)),
            infer={"enumerate": "parallel"},
        )
        for t in pyro.markov(range(T)):
            z = pyro.sample(
                f"z_{t}",
                dist.Categorical(logits=jnp.zeros((S, S))[z]),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(f"x_{t}", dist.Normal(z.astype(float), 1.0), obs=jnp.array(0.5))

    enum_model = poutine.enum(
        poutine.seed(model, 0), first_available_dim=-1
    )
    tr = poutine.trace(enum_model).get_trace()
    max_batch_ndim = max(
        jnp.ndim(site["value"])
        for name, site in tr.nodes.items()
        if name.startswith("z_")
    )
    assert max_batch_ndim <= 3  # not O(T)


def test_config_enumerate_and_training_gmm():
    """Train a 2-component GMM with enumerated assignments."""
    data = jnp.concatenate(
        [
            -2.0 + 0.3 * jax.random.normal(jax.random.key(1), (50,)),
            2.0 + 0.3 * jax.random.normal(jax.random.key(2), (50,)),
        ]
    )

    @config_enumerate
    def model(data):
        weights = pyro.sample("weights", dist.Dirichlet(jnp.ones(2)))
        with pyro.plate("components", 2):
            locs = pyro.sample("locs", dist.Normal(0.0, 10.0))
        with pyro.plate("data", data.shape[0]):
            z = pyro.sample("z", dist.Categorical(probs=weights))
            pyro.sample("obs", dist.Normal(Vindex(locs)[..., z], 0.3), obs=data)

    def guide(data):
        w = pyro.param(
            "w_post",
            jnp.ones(2),
            constraint=dist.constraints.positive,
        )
        pyro.sample("weights", dist.Dirichlet(w))
        loc_loc = pyro.param("loc_loc", jnp.array([-0.5, 0.5]))
        loc_scale = pyro.param(
            "loc_scale",
            jnp.full((2,), 0.1),
            constraint=dist.constraints.positive,
        )
        with pyro.plate("components", 2):
            pyro.sample("locs", dist.Normal(loc_loc, loc_scale))

    svi = SVI(
        model,
        guide,
        Adam({"lr": 0.05}),
        TraceEnum_ELBO(max_plate_nesting=1),
    )
    for _ in range(800):
        svi.step(data)
    locs = np.sort(np.asarray(pyro.get_param_store()["loc_loc"]))
    assert np.allclose(locs, [-2.0, 2.0], atol=0.3), locs


def test_compute_marginals():
    probs = jnp.array([0.25, 0.75])
    locs = jnp.array([-1.0, 2.0])
    data = jnp.array([2.2])

    def model():
        with pyro.plate("data", 1):
            z = pyro.sample(
                "z",
                dist.Categorical(probs=probs),
                infer={"enumerate": "parallel"},
            )
            pyro.sample("obs", dist.Normal(locs[z], 1.0), obs=data)

    def guide():
        pass

    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    marginals = elbo.compute_marginals(model, guide, rng_key=KEY)
    post = np.asarray(marginals["z"].probs)
    # exact posterior
    lp = np.log(np.asarray(probs)) + np.asarray(
        dist.Normal(locs, 1.0).log_prob(data[0])
    )
    expected = np.exp(lp - logsumexp(lp))
    assert np.allclose(post.reshape(-1), expected, rtol=1e-4)


def test_infer_discrete_map_decoding():
    """MAP decoding of a mixture assignment recovers the obvious labels."""
    from pyro_tpu.infer import infer_discrete

    locs = jnp.array([-2.0, 2.0])
    data = jnp.array([-2.1, 1.9, -1.8, 2.2])

    def model(data):
        with pyro.plate("data", data.shape[0]):
            z = pyro.sample(
                "z",
                dist.Categorical(probs=jnp.array([0.5, 0.5])),
                infer={"enumerate": "parallel"},
            )
            pyro.sample("obs", dist.Normal(locs[z], 0.5), obs=data)
        return z

    decoded_model = infer_discrete(
        model, first_available_dim=-2, temperature=0,
        rng_key=jax.random.key(0),
    )
    tr = poutine.trace(decoded_model).get_trace(data)
    z = np.asarray(tr.nodes["z"]["value"])
    assert z.tolist() == [0, 1, 0, 1]


def test_infer_discrete_chain_posterior_sampling():
    """Posterior samples from a 2-state chain follow exact marginals."""
    from pyro_tpu.infer import infer_discrete

    p_init = jnp.array([0.5, 0.5])
    trans = jnp.array([[0.9, 0.1], [0.1, 0.9]])
    data = jnp.array([0.0, 0.0, 5.0])
    locs = jnp.array([0.0, 5.0])

    def model():
        z = pyro.sample(
            "z0",
            dist.Categorical(probs=p_init),
            infer={"enumerate": "parallel"},
        )
        pyro.sample("x0", dist.Normal(locs[z], 1.0), obs=data[0])
        for t in pyro.markov(range(1, 3)):
            z = pyro.sample(
                f"z{t}",
                dist.Categorical(probs=trans[z]),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(f"x{t}", dist.Normal(locs[z], 1.0), obs=data[t])
        return z

    counts = np.zeros(2)
    n = 200
    for i in range(n):
        m = infer_discrete(
            model, first_available_dim=-1, temperature=1,
            rng_key=jax.random.key(i),
        )
        tr = poutine.trace(m).get_trace()
        counts[int(tr.nodes["z0"]["value"])] += 1
    # exact posterior over z0 by brute force
    from itertools import product as iproduct

    joint = {}
    for zs in iproduct(range(2), repeat=3):
        lp = np.log(p_init[zs[0]])
        lp += float(dist.Normal(locs[zs[0]], 1.0).log_prob(data[0]))
        for t in (1, 2):
            lp += np.log(trans[zs[t - 1], zs[t]])
            lp += float(dist.Normal(locs[zs[t]], 1.0).log_prob(data[t]))
        joint[zs] = np.exp(lp)
    total = sum(joint.values())
    p_z0_1 = sum(v for k, v in joint.items() if k[0] == 1) / total
    assert abs(counts[1] / n - p_z0_1) < 0.12, (counts[1] / n, p_z0_1)


@pytest.mark.stage("integration")
def test_hmm_example_models_train():
    """examples/hmm.py models 0-2 run end-to-end (smoke, tiny shapes)."""
    import sys, types, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from examples import hmm as hmm_example

    args = types.SimpleNamespace(
        model=1, hidden_dim=3, num_sequences=4, max_length=6,
        data_dim=4, num_steps=3, learning_rate=0.05, seed=0,
    )
    for m in (0, 1, 2):
        pyro.clear_param_store()
        args.model = m
        hmm_example.main(args)


def test_compute_marginals_markov_chain():
    """Adjoint marginals for a 4-step enumerated markov chain match the
    brute-force smoothing posteriors (one fwd+bwd pass computes all of
    them simultaneously)."""
    import itertools

    T, K = 4, 3
    rng = np.random.RandomState(0)
    init = jnp.asarray(rng.dirichlet(np.ones(K)))
    trans = jnp.asarray(rng.dirichlet(np.ones(K), size=K))
    locs = jnp.asarray([-2.0, 0.0, 2.0])
    data = jnp.asarray([-1.8, 0.2, 1.9, 0.1])

    def model():
        z = None
        for t in pyro.markov(range(T)):
            probs = init if z is None else trans[z]
            z = pyro.sample(
                f"z_{t}",
                dist.Categorical(probs=probs),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(f"x_{t}", dist.Normal(locs[z], 1.0), obs=data[t])

    def guide():
        pass

    elbo = TraceEnum_ELBO(max_plate_nesting=0)
    marginals = elbo.compute_marginals(model, guide, rng_key=KEY)

    # brute force over all K^T paths
    joint = {}
    for path in itertools.product(range(K), repeat=T):
        lp = float(jnp.log(init[path[0]]))
        for t in range(1, T):
            lp += float(jnp.log(trans[path[t - 1], path[t]]))
        for t in range(T):
            lp += float(dist.Normal(locs[path[t]], 1.0).log_prob(data[t]))
        joint[path] = lp
    Z = logsumexp(np.asarray(list(joint.values())))
    for t in range(T):
        expected = np.zeros(K)
        for path, lp in joint.items():
            expected[path[t]] += np.exp(lp - Z)
        actual = np.asarray(marginals[f"z_{t}"].probs).reshape(-1)
        assert np.allclose(actual, expected, atol=1e-4), (t, actual, expected)


def test_traceenum_reparam_guide_unbiased():
    """Regression: DiCE must NOT add score-function factors for
    reparameterized guide sites (double-counts with the pathwise gradient
    and biases the fit; a Beta-Bernoulli posterior landed at 0.20 instead
    of 0.105)."""
    from pyro_tpu.distributions import constraints
    from pyro_tpu.optim import Adam

    rng = np.random.RandomState(0)
    A = jnp.asarray((rng.rand(500) < 0.109).astype(np.float32))

    def model(data):
        p = pyro.sample("p", dist.Beta(1.0, 1.0))
        with pyro.plate("d", 500):
            pyro.sample("A", dist.Bernoulli(p), obs=data)

    def guide(data):
        a = pyro.param("a", jnp.ones(()), constraint=constraints.positive)
        b = pyro.param(
            "b", 10.0 * jnp.ones(()), constraint=constraints.positive
        )
        pyro.sample("p", dist.Beta(a, b))

    pyro.clear_param_store()
    svi = SVI(
        model,
        guide,
        Adam({"lr": 0.05}),
        TraceEnum_ELBO(max_plate_nesting=1),
    )
    for _ in range(2000):
        svi.step(A)
    store = pyro.get_param_store()
    post_mean = float(store["a"] / (store["a"] + store["b"]))
    # exact posterior: Beta(1 + 54, 1 + 446) -> mean 0.1046
    assert abs(post_mean - float(A.mean() * 500 + 1) / 502) < 0.02, post_mean
