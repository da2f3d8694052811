"""Bring-your-own training loop: raw optax optimization of an ELBO.

Ref ``examples/svi_torch.py`` / ``svi_lightning.py`` (vanilla-framework
training loops around ``Trace_ELBO.differentiable_loss``).  The TPU
analog: expose the ELBO as a *pure function* of the unconstrained param
pytree via :class:`pyro_tpu.infer.svi.ParamsMessenger`, then drive it
with any optax optimizer — custom schedules, weight decay, gradient
clipping, data loaders — inside one jitted update.

Run:  python examples/svi_optax.py --num-steps 1000
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import Trace_ELBO
from pyro_tpu.infer.autoguide import AutoNormal
from pyro_tpu.infer.svi import ParamsMessenger


def model(covariates, data=None):
    coeff = pyro.sample("coeff", dist.Normal(0.0, 1.0))
    bias = pyro.sample("bias", dist.Normal(0.0, 1.0))
    scale = pyro.sample("scale", dist.LogNormal(0.0, 1.0))
    with pyro.plate("data", covariates.shape[0]):
        loc = coeff * covariates + bias
        return pyro.sample("obs", dist.Normal(loc, scale), obs=data)


def main(args):
    pyro.set_rng_seed(args.seed)
    pyro.clear_param_store()

    covariates = jnp.linspace(-1.0, 1.0, args.size)
    data = 3.0 * covariates + 1.0 + 0.1 * jax.random.normal(
        jax.random.key(args.seed), (args.size,)
    )

    guide = AutoNormal(model)
    elbo = Trace_ELBO()

    # materialize params once, then treat the loss as a pure function of
    # the unconstrained pytree
    elbo.loss(model, guide, covariates, data, rng_key=jax.random.key(0))
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(params, rng_key):
        with ParamsMessenger(params, store):
            return elbo.differentiable_loss(
                model, guide, covariates, data, rng_key=rng_key
            )

    # any optax transform chain works here: cosine schedule + adamw + clip
    schedule = optax.cosine_decay_schedule(
        args.learning_rate, args.num_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(schedule, weight_decay=1e-4),
    )
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(args.seed + 1)
    for step in range(args.num_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = update(params, opt_state, sub)
        if step % 100 == 0:
            print(f"step {step} loss = {float(loss):0.4g}")

    # write the optimized values back so downstream pyro code sees them
    store.set_all_unconstrained(params)
    coeff = float(np.asarray(pyro.param("AutoNormal.locs.coeff")))
    bias = float(np.asarray(pyro.param("AutoNormal.locs.bias")))
    print(f"learned coeff = {coeff:0.3f} (true 3.0)")
    print(f"learned bias  = {bias:0.3f} (true 1.0)")
    if args.num_steps >= 1000:
        assert abs(coeff - 3.0) < 0.2, coeff
        assert abs(bias - 1.0) < 0.2, bias
    return coeff, bias


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="raw optax training loop around a pyro_tpu ELBO"
    )
    p.add_argument("--size", type=int, default=100)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
