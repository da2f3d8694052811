"""Multi-device parallelism tests on the virtual 8-device CPU mesh.

Verifies the TPU-native replacements for the reference's distributed
backends (SURVEY §2.8-2.9): DataParallelSVI replaces Horovod allreduce
(ref ``pyro/optim/horovod.py:13``), sharded-chain MCMC replaces
``torch.multiprocessing`` pools (ref ``pyro/infer/mcmc/api.py:88-351``),
and the sharded-time associative-scan GaussianHMM covers P6.

Each test asserts the multi-device result against the single-device
ground truth — not just "it runs".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.mcmc import MCMC, NUTS
from pyro_tpu.optim import Adam
from pyro_tpu.parallel import DataParallelSVI, sharded_chain_mcmc
from pyro_tpu.parallel.mesh import create_mesh, replicate, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _regression_model_guide():
    def model(X, y):
        w = pyro.sample("w", dist.Normal(jnp.zeros(3), 10.0).to_event(1))
        with pyro.plate("data", X.shape[0]):
            pyro.sample("obs", dist.Normal(X @ w, 0.5), obs=y)

    def guide(X, y):
        loc = pyro.param("loc", jnp.zeros(3))
        scale = pyro.param(
            "scale",
            0.1 * jnp.ones(3),
            constraint=dist.constraints.positive,
        )
        pyro.sample("w", dist.Normal(loc, scale).to_event(1))

    X = jax.random.normal(jax.random.key(0), (64, 3))
    y = X @ jnp.array([1.0, -2.0, 0.5])
    return model, guide, X, y


def test_data_parallel_svi_matches_single_device():
    """DataParallelSVI on an 8-way data mesh produces the same losses and
    updated params as plain SVI on the same data and keys."""
    model, guide, X, y = _regression_model_guide()
    keys = [jax.random.key(i + 1) for i in range(5)]

    pyro.clear_param_store()
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO())
    ref_losses = [svi.step(X, y, rng_key=k) for k in keys]
    store = pyro.get_param_store()
    ref_params = {k: np.asarray(store[k]) for k in ("loc", "scale")}

    pyro.clear_param_store()
    mesh = create_mesh(axis_names=("data",))
    dp = DataParallelSVI(
        model, guide, Adam({"lr": 0.05}), Trace_ELBO(), mesh=mesh
    )
    dp_losses = [dp.step(X, y, rng_key=k) for k in keys]
    dp_params = {k: np.asarray(store[k]) for k in ("loc", "scale")}

    np.testing.assert_allclose(ref_losses, dp_losses, rtol=1e-4)
    for name in ref_params:
        np.testing.assert_allclose(
            ref_params[name], dp_params[name], rtol=1e-4, atol=1e-6
        )


def test_sharded_chain_mcmc_matches_vmapped():
    """Sharding the chain axis over 8 devices must not change the draws
    relative to the unsharded vmapped run (same program, same keys)."""

    def model():
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=jnp.array(0.5))

    def run(sharded):
        kernel = NUTS(model, max_tree_depth=4)
        if sharded:
            mesh = create_mesh(axis_names=("chain",))
            mcmc = sharded_chain_mcmc(
                kernel, num_samples=20, warmup_steps=20, num_chains=8,
                mesh=mesh,
            )
            mcmc.run_sharded(rng_key=jax.random.key(11))
        else:
            mcmc = MCMC(
                kernel, num_samples=20, warmup_steps=20, num_chains=8
            )
            mcmc.run(rng_key=jax.random.key(11))
        return mcmc

    ref = run(sharded=False)
    shd = run(sharded=True)
    np.testing.assert_allclose(
        np.asarray(ref.get_samples()["loc"]),
        np.asarray(shd.get_samples()["loc"]),
        rtol=1e-5,
        atol=1e-6,
    )
    ref_diag = ref.diagnostics()["loc"]
    shd_diag = shd.diagnostics()["loc"]
    np.testing.assert_allclose(
        np.asarray(ref_diag["r_hat"]),
        np.asarray(shd_diag["r_hat"]),
        rtol=1e-4,
    )


def test_horovod_optimizer_pmean_under_shard_map():
    """HorovodOptimizer averages gradients over the mapped axis: per-device
    updates from distinct grads must equal a single update from the mean
    grad.  Also checks the no-mapped-axis fallback passes grads through."""
    from jax import shard_map

    from pyro_tpu.optim import HorovodOptimizer

    mesh = create_mesh(axis_names=("data",))
    n = mesh.shape["data"]
    params = {"w": jnp.ones(4)}
    per_device_grads = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
    mean_grads = {"w": per_device_grads.mean(0)}

    hvd = HorovodOptimizer(Adam({"lr": 0.1}), axis_name="data")
    opt_state = hvd.init(params)

    def step(g_local):
        new_params, _ = hvd.update({"w": g_local[0]}, opt_state, params)
        return new_params["w"][None]

    sharded_step = shard_map(
        step, mesh=mesh, in_specs=P("data"), out_specs=P("data")
    )
    updated = sharded_step(per_device_grads)
    expected, _ = Adam({"lr": 0.1}).update(
        mean_grads, Adam({"lr": 0.1}).init(params), params
    )
    for row in np.asarray(updated):
        np.testing.assert_allclose(
            row, np.asarray(expected["w"]), rtol=1e-5
        )

    # outside any mapped axis the allreduce is the identity
    passthrough = hvd._allreduce({"w": jnp.arange(4.0)})
    np.testing.assert_allclose(
        np.asarray(passthrough["w"]), np.arange(4.0)
    )


def test_gaussian_hmm_sharded_time_matches_unsharded():
    """GaussianHMM.log_prob (associative-scan filter, P6) with the time
    axis sharded over 8 devices equals the unsharded value."""
    hidden, obs_dim, T = 2, 3, 64
    k = jax.random.key(3)
    ks = jax.random.split(k, 4)
    init = dist.Normal(jnp.zeros(hidden), 1.0).to_event(1)
    trans_mat = 0.5 * jnp.eye(hidden) + 0.05 * jax.random.normal(
        ks[0], (hidden, hidden)
    )
    trans = dist.Normal(jnp.zeros(hidden), 0.3).to_event(1)
    obs_mat = jax.random.normal(ks[1], (hidden, obs_dim)) / np.sqrt(hidden)
    obs = dist.Normal(jnp.zeros(obs_dim), 0.5).to_event(1)
    hmm = dist.GaussianHMM(init, trans_mat, trans, obs_mat, obs, duration=T)
    data = jax.random.normal(ks[2], (T, obs_dim))

    lp_fn = jax.jit(lambda x: hmm.log_prob(x))
    ref = lp_fn(data)

    mesh = create_mesh(axis_names=("time",))
    sharded_data = jax.device_put(data, NamedSharding(mesh, P("time")))
    out = lp_fn(sharded_data)
    np.testing.assert_allclose(
        float(ref), float(out), rtol=1e-5
    )


def test_shard_batch_replicate_helpers():
    mesh = create_mesh(axis_names=("data",))
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data")
    xr = replicate(mesh, {"a": x})["a"]
    assert xr.sharding.spec == P()
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))
