"""Single-pass infer_discrete: exact joint sampling in ONE contraction.

Ref ``pyro/ops/einsum/adjoint.py`` semantics: posterior samples of all
enumerated sites come from one taping forward contraction plus a
backward sweep (``ops/einsum_sample.py``).  Checks:

* sampled joint distribution equals the brute-force joint posterior;
* temperature=0 returns the exact joint MAP (argmax of the joint, not
  the sequence of conditional argmaxes);
* contraction count is 1, independent of the number of sites.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import infer_discrete
from pyro_tpu.ops.indexing import Vindex


def _chain_model(data, T, trans, locs):
    x = None
    for t in pyro.markov(range(T)):
        probs = trans[0] if x is None else trans[1][x]
        x = pyro.sample(
            f"x_{t}",
            dist.Categorical(probs),
            infer={"enumerate": "parallel"},
        )
        pyro.sample(f"y_{t}", dist.Normal(locs[x], 1.0), obs=data[t])
    return x


def _brute_force_joint(data, T, trans, locs):
    """Exact log joint over all 2^... configurations."""
    K = locs.shape[0]
    configs = list(itertools.product(range(K), repeat=T))
    logp = []
    trans0, transM = np.asarray(trans[0]), np.asarray(trans[1])
    locs = np.asarray(locs)
    data = np.asarray(data)
    for cfg in configs:
        lp = np.log(trans0[cfg[0]])
        for t in range(1, T):
            lp += np.log(transM[cfg[t - 1], cfg[t]])
        for t in range(T):
            lp += -0.5 * (data[t] - locs[cfg[t]]) ** 2 - 0.5 * np.log(
                2 * np.pi
            )
        logp.append(lp)
    logp = np.array(logp)
    p = np.exp(logp - logp.max())
    return configs, p / p.sum()


TRANS = (
    jnp.array([0.6, 0.4]),
    jnp.array([[0.8, 0.2], [0.3, 0.7]]),
)
LOCS = jnp.array([-1.0, 1.0])


def test_posterior_sampling_matches_brute_force():
    T = 4
    data = jnp.array([-0.5, 1.2, 0.3, -0.8])
    configs, probs = _brute_force_joint(data, T, TRANS, LOCS)
    cfg_index = {c: i for i, c in enumerate(configs)}

    N = 4000
    counts = np.zeros(len(configs))

    def sampler(key):
        f = infer_discrete(
            lambda: _chain_model(data, T, TRANS, LOCS),
            first_available_dim=-1,
            temperature=1,
            rng_key=key,
        )
        tr = poutine.trace(f).get_trace()
        return jnp.stack(
            [tr.nodes[f"x_{t}"]["value"] for t in range(T)]
        )

    keys = jax.random.split(jax.random.key(0), N)
    draws = np.asarray(jax.vmap(sampler)(keys))
    for row in draws:
        counts[cfg_index[tuple(int(v) for v in row)]] += 1
    freq = counts / N
    # chi-square-ish bound: 4k draws over 16 configs
    np.testing.assert_allclose(freq, probs, atol=0.035)


def test_map_is_exact_joint_argmax():
    T = 5
    data = jnp.array([-0.5, 1.2, 0.3, -0.8, 1.5])
    configs, probs = _brute_force_joint(data, T, TRANS, LOCS)
    expected = configs[int(np.argmax(probs))]
    f = infer_discrete(
        lambda: _chain_model(data, T, TRANS, LOCS),
        first_available_dim=-1,
        temperature=0,
        rng_key=jax.random.key(0),
    )
    tr = poutine.trace(f).get_trace()
    got = tuple(int(tr.nodes[f"x_{t}"]["value"]) for t in range(T))
    assert got == expected, (got, expected)


@pytest.mark.parametrize("T", [3, 8, 16])
def test_single_contraction_regardless_of_sites(T, monkeypatch):
    from pyro_tpu.ops import einsum_sample

    calls = []
    orig = einsum_sample.contract_to_tensor

    def counting(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(einsum_sample, "contract_to_tensor", counting)
    data = jnp.zeros(T)
    f = infer_discrete(
        lambda: _chain_model(data, T, TRANS, LOCS),
        first_available_dim=-1,
        temperature=1,
        rng_key=jax.random.key(0),
    )
    poutine.trace(f).get_trace()
    assert len(calls) == 1


def test_plated_mixture_map_and_sampling():
    """Local discrete vars inside a plate: per-datapoint assignments."""
    data = jnp.array([-2.1, -1.9, 2.0, 2.2, -2.0])
    locs = jnp.array([-2.0, 2.0])

    def model():
        with pyro.plate("data", data.shape[0], dim=-1):
            z = pyro.sample(
                "z",
                dist.Categorical(jnp.array([0.5, 0.5])),
                infer={"enumerate": "parallel"},
            )
            pyro.sample("obs", dist.Normal(Vindex(locs)[z], 0.5), obs=data)

    f = infer_discrete(
        model, first_available_dim=-2, temperature=0, rng_key=jax.random.key(0)
    )
    tr = poutine.trace(f).get_trace()
    z = np.asarray(tr.nodes["z"]["value"])
    np.testing.assert_array_equal(z, [0, 0, 1, 1, 0])
    # sampling mode: overwhelming posterior concentrates on the same z
    f1 = infer_discrete(
        model, first_available_dim=-2, temperature=1, rng_key=jax.random.key(1)
    )
    z1 = np.asarray(poutine.trace(f1).get_trace().nodes["z"]["value"])
    np.testing.assert_array_equal(z1, [0, 0, 1, 1, 0])


def test_mixed_global_local_sites():
    """A global discrete var + plated local vars sample consistently."""
    data = jnp.array([-2.0, -1.8, 2.1])

    def model():
        k = pyro.sample(
            "k",
            dist.Categorical(jnp.array([0.5, 0.5])),
            infer={"enumerate": "parallel"},
        )
        scale = jnp.where(k == 1, 0.5, 2.0)
        with pyro.plate("data", data.shape[0], dim=-1):
            z = pyro.sample(
                "z",
                dist.Categorical(jnp.array([0.5, 0.5])),
                infer={"enumerate": "parallel"},
            )
            locs = jnp.array([-2.0, 2.0])
            pyro.sample(
                "obs", dist.Normal(Vindex(locs)[z], scale), obs=data
            )

    f = infer_discrete(
        model, first_available_dim=-2, temperature=0, rng_key=jax.random.key(0)
    )
    tr = poutine.trace(f).get_trace()
    assert int(tr.nodes["k"]["value"]) == 1  # tight scale fits data better
    np.testing.assert_array_equal(
        np.asarray(tr.nodes["z"]["value"]), [0, 0, 1]
    )
