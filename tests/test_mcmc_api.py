"""MCMC API contract tests.

Ports the *semantics* of the reference's
``tests/infer/mcmc/test_mcmc_api.py`` (hook_fn call pattern, num_chains
surface, get_samples shapes, diagnostics structure, save_params,
potential_fn kernels, StreamingMCMC == dense MCMC on the same draws) to
the vmapped-chain design.  Documented deviations: chains are a vmapped
axis of one compiled program, so with num_chains > 1 the hook fires once
per step with all chains batched (not once per chain per step), and
``mp_context`` is accepted-but-warned rather than spawning processes.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer.mcmc import HMC, MCMC, NUTS
from pyro_tpu.infer.mcmc.rwkernel import RandomWalkKernel
from pyro_tpu.infer.mcmc.streaming import StreamingMCMC
from pyro_tpu.infer.mcmc.util import initialize_model

DATA = jnp.array([1.0, 2.0, 3.0])


def normal_normal_model(data):
    # ref test_mcmc_api.py:72-77
    y = pyro.sample("y", dist.Normal(jnp.zeros(data.shape), 1.0).to_event(1))
    pyro.sample("obs", dist.Normal(y, 1.0).to_event(1), obs=data)
    return y


W, S = 10, 25


def _run(num_chains=1, **kw):
    kernel = kw.pop("kernel", None) or RandomWalkKernel(normal_normal_model)
    mcmc = MCMC(
        kernel,
        num_samples=kw.pop("num_samples", S),
        warmup_steps=kw.pop("warmup_steps", W),
        num_chains=num_chains,
        **kw,
    )
    mcmc.run(DATA, rng_key=jax.random.key(0))
    return mcmc


# -- get_samples shapes (ref :158-194 test_mcmc_interface) --------------------


@pytest.mark.parametrize("num_chains", [1, 2])
@pytest.mark.parametrize("group_by_chain", [True, False])
def test_get_samples_shape(num_chains, group_by_chain):
    mcmc = _run(num_chains)
    samples = mcmc.get_samples(group_by_chain=group_by_chain)
    if group_by_chain:
        assert samples["y"].shape == (num_chains, S, 3)
    else:
        assert samples["y"].shape == (num_chains * S, 3)


def test_get_samples_num_draws():
    mcmc = _run(2)
    samples = mcmc.get_samples(num_samples=7)
    assert samples["y"].shape == (7, 3)
    grouped = mcmc.get_samples(num_samples=1, group_by_chain=True)
    assert grouped["y"].shape == (1, S, 3)


def test_posterior_is_sane():
    # normal-normal conjugate posterior mean = data / 2
    mcmc = _run(4, num_samples=300, warmup_steps=200, kernel=NUTS(normal_normal_model))
    y = mcmc.get_samples()["y"]
    np.testing.assert_allclose(y.mean(0), np.asarray(DATA) / 2, atol=0.25)


def test_num_chains_surface():
    mcmc = _run(3)
    assert mcmc.num_chains == 3
    assert mcmc.get_samples(group_by_chain=True)["y"].shape[0] == 3


def test_get_samples_before_run_raises():
    mcmc = MCMC(RandomWalkKernel(normal_normal_model), num_samples=5)
    with pytest.raises(RuntimeError):
        mcmc.get_samples()


def test_unknown_chain_method_raises():
    with pytest.raises(ValueError):
        MCMC(
            RandomWalkKernel(normal_normal_model),
            num_samples=5,
            chain_method="processes",
        )


def test_mp_context_warns(caplog, monkeypatch):
    # the package logger doesn't propagate to root; let caplog see it
    monkeypatch.setattr(logging.getLogger("pyro_tpu"), "propagate", True)
    with caplog.at_level(logging.WARNING, logger="pyro_tpu"):
        MCMC(RandomWalkKernel(normal_normal_model), num_samples=5, mp_context="spawn")
    assert any("mp_context" in r.getMessage() for r in caplog.records)


# -- hook_fn call pattern (ref :240-283 test_null_model_with_hook) ------------


@pytest.mark.parametrize("Kernel", [HMC, NUTS])
def test_hook_fn_single_chain(Kernel):
    iters = []

    def hook(kernel, params, stage, i):
        assert isinstance(params, dict) and "y" in params
        iters.append((stage, i))

    kernel = Kernel(normal_normal_model)
    mcmc = MCMC(kernel, num_samples=5, warmup_steps=4, hook_fn=hook)
    mcmc.run(DATA, rng_key=jax.random.key(0))
    expected = [("warmup", i) for i in range(4)] + [("sample", i) for i in range(5)]
    assert iters == expected


def test_hook_fn_vectorized_chains_batched():
    # documented deviation: with num_chains > 1 the hook fires once per
    # step with ALL chains batched (leading chain axis on each site)
    iters = []

    def hook(kernel, params, stage, i):
        assert params["y"].shape == (2, 3)
        iters.append((stage, i))

    mcmc = MCMC(
        RandomWalkKernel(normal_normal_model),
        num_samples=5,
        warmup_steps=4,
        num_chains=2,
        hook_fn=hook,
    )
    mcmc.run(DATA, rng_key=jax.random.key(0))
    assert len(iters) == 9  # (4 + 5) steps, NOT steps * chains


# -- diagnostics structure (ref :289-326 test_mcmc_diagnostics) ---------------


@pytest.mark.parametrize("num_chains", [1, 2])
def test_diagnostics_structure(num_chains):
    mcmc = _run(num_chains)
    diagnostics = mcmc.diagnostics()
    assert diagnostics["y"]["n_eff"].shape == DATA.shape
    assert diagnostics["y"]["r_hat"].shape == DATA.shape
    assert np.isfinite(np.asarray(diagnostics["y"]["n_eff"])).all()
    assert "divergences" in diagnostics and "acceptance rate" in diagnostics
    assert diagnostics["divergences"]["total"] >= 0
    assert 0.0 <= diagnostics["acceptance rate"]["mean"] <= 1.0


def test_summary_smoke(capsys):
    mcmc = _run(2)
    mcmc.summary()
    out = capsys.readouterr().out
    assert "n_eff" in out and "r_hat" in out and "divergences" in out.lower()


# -- save_params (ref :393-430 test_save_params) ------------------------------


@pytest.mark.parametrize("save_params", [["x"], ["y"], ["x", "y"]])
@pytest.mark.parametrize(
    "Kernel, options", [(HMC, {}), (NUTS, {"max_tree_depth": 2})]
)
def test_save_params(save_params, Kernel, options):
    def model():
        x = pyro.sample("x", dist.Normal(0.0, 1.0))
        with pyro.plate("plate", 2):
            y = pyro.sample("y", dist.Normal(x, 1.0))
            pyro.sample("obs", dist.Normal(y, 1.0), obs=jnp.zeros(2))

    kernel = Kernel(model, **options)
    mcmc = MCMC(kernel, warmup_steps=2, num_samples=4, save_params=save_params)
    mcmc.run(rng_key=jax.random.key(0))
    assert set(mcmc.get_samples().keys()) == set(save_params)
    diagnostics = {k: v for k, v in mcmc.diagnostics().items() if k in ("x", "y")}
    assert set(diagnostics.keys()) == set(save_params)
    mcmc.summary()  # smoke, as in the reference


# -- potential_fn kernels (ref :370-390 test_model_with_potential_fn) ---------


@pytest.mark.parametrize("Kernel", [HMC, NUTS])
def test_model_with_potential_fn(Kernel):
    init_params = {"z": jnp.array(0.0)}

    def potential_fn(params):
        return params["z"] ** 2

    kernel = Kernel(potential_fn=potential_fn)
    mcmc = MCMC(
        kernel, num_samples=10, warmup_steps=10, initial_params=init_params
    )
    mcmc.run(rng_key=jax.random.key(0))
    assert mcmc.get_samples()["z"].shape == (10,)


def test_kernel_requires_model_or_potential():
    with pytest.raises(ValueError):
        HMC()


# -- determinism / sequential consistency (ref :328-368) ----------------------


def test_rerun_is_deterministic():
    # no state leaks between runs: same seed -> identical samples
    s1 = _run(2).get_samples(group_by_chain=True)
    s2 = _run(2).get_samples(group_by_chain=True)
    np.testing.assert_array_equal(s1["y"], s2["y"])


def test_sequential_matches_vectorized():
    # chain_method="sequential" must produce the same draws as the
    # vmapped default for the same rng_key
    sv = _run(2, chain_method="vectorized").get_samples(group_by_chain=True)
    ss = _run(2, chain_method="sequential").get_samples(group_by_chain=True)
    np.testing.assert_allclose(ss["y"], sv["y"], rtol=1e-5, atol=1e-6)


def test_thinning_shape():
    mcmc = MCMC(
        RandomWalkKernel(normal_normal_model),
        num_samples=20,
        warmup_steps=5,
        thinning=4,
    )
    mcmc.run(DATA, rng_key=jax.random.key(0))
    assert mcmc.get_samples(group_by_chain=True)["y"].shape == (1, 5, 3)


# -- StreamingMCMC == dense MCMC on the same draws (ref :289-326) --------------


@pytest.mark.parametrize("num_chains", [1, 2])
def test_streaming_matches_dense_on_same_draws(num_chains):
    kw = dict(num_samples=50, warmup_steps=10, num_chains=num_chains)
    dense = MCMC(RandomWalkKernel(normal_normal_model), **kw)
    dense.run(DATA, rng_key=jax.random.key(7))
    streaming = StreamingMCMC(RandomWalkKernel(normal_normal_model), **kw)
    streaming.run(DATA, rng_key=jax.random.key(7))

    stats = streaming.get_statistics()
    # identical rng split -> identical chains -> streaming Welford mean /
    # variance equal the dense samples' moments (unconstrained axis; the
    # model has identity transforms so constrained == unconstrained here)
    y = np.asarray(dense.get_samples(group_by_chain=True)["y"])
    np.testing.assert_allclose(
        np.asarray(stats["unconstrained_mean"]), y.mean(axis=1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["unconstrained_variance"]),
        y.var(axis=1, ddof=1),
        rtol=1e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats["constrained_mean_point"]["y"]),
        y.mean(axis=1),
        rtol=1e-4,
        atol=1e-5,
    )


def test_initialize_model_surface():
    info = initialize_model(normal_normal_model, model_args=(DATA,))
    # the returned potential_fn evaluates finitely at the initial params
    pe = info.potential_fn(info.initial_params)
    assert np.isfinite(float(pe))
    # initial params respected by MCMC
    mcmc = MCMC(
        HMC(potential_fn=info.potential_fn),
        num_samples=5,
        warmup_steps=5,
        initial_params=info.initial_params,
    )
    mcmc.run(rng_key=jax.random.key(0))
    assert set(mcmc.get_samples().keys()) == set(info.initial_params.keys())
