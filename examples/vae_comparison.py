"""VAE two ways: pyro_tpu SVI vs a hand-derived pure-JAX ELBO.

Ref ``examples/vae/vae_comparison.py`` (Pyro VAE vs a raw-PyTorch VAE,
used for profiling and as a correctness cross-check).  Here the same
flax encoder/decoder pair is trained (a) through `pyro_tpu` SVI and
(b) through a manually derived reparameterized ELBO optimized with raw
optax.  With identical initialization and data, the two per-step losses
must track each other closely — any systematic gap is a framework bug.

Run:  python examples/vae_comparison.py --num-steps 200
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.nn import flax_module
from pyro_tpu.optim import Adam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

X_DIM, HIDDEN, Z_DIM = 784, 200, 20


class Decoder(nn.Module):
    @nn.compact
    def __call__(self, z):
        h = nn.softplus(nn.Dense(HIDDEN)(z))
        return nn.Dense(X_DIM)(h)


class Encoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.softplus(nn.Dense(HIDDEN)(x))
        loc = nn.Dense(Z_DIM)(h)
        log_scale = nn.Dense(Z_DIM)(h)
        return loc, jnp.exp(jnp.clip(log_scale, -5.0, 5.0))


def make_data(key, batch_size):
    k1, k2 = jax.random.split(key)
    basis = jax.random.normal(k1, (16, X_DIM))
    codes = jax.random.normal(k2, (batch_size, 16))
    probs = jax.nn.sigmoid(codes @ basis * 2.0)
    return (jax.random.uniform(k2, probs.shape) < probs).astype(
        jnp.float32
    )


# -- (a) pyro_tpu SVI -------------------------------------------------------


def run_pyro(x, num_steps, lr, seed):
    pyro.clear_param_store()
    from pyro_tpu.nn import clear_module_registry

    clear_module_registry()
    pyro.set_rng_seed(seed)

    def model(x):
        decoder = flax_module(
            "decoder", Decoder(), jnp.zeros((1, Z_DIM))
        )
        with pyro.plate("data", x.shape[0]):
            z = pyro.sample(
                "z", dist.Normal(jnp.zeros(Z_DIM), 1.0).to_event(1)
            )
            pyro.sample(
                "obs",
                dist.Bernoulli(logits=decoder(z)).to_event(1),
                obs=x,
            )

    def guide(x):
        encoder = flax_module(
            "encoder", Encoder(), jnp.zeros((1, X_DIM))
        )
        with pyro.plate("data", x.shape[0]):
            loc, scale = encoder(x)
            pyro.sample("z", dist.Normal(loc, scale).to_event(1))

    svi = SVI(model, guide, Adam({"lr": lr}), Trace_ELBO())
    losses = svi.run_steps(num_steps, x, rng_key=jax.random.key(seed))
    return np.asarray(losses) / x.shape[0]


# -- (b) hand-derived ELBO with raw optax -----------------------------------


def run_raw(x, num_steps, lr, seed):
    dec, enc = Decoder(), Encoder()
    # identical init to flax_module's (key 0 on the template shapes)
    params = {
        "dec": dec.init(jax.random.key(0), jnp.zeros((1, Z_DIM))),
        "enc": enc.init(jax.random.key(0), jnp.zeros((1, X_DIM))),
    }

    def neg_elbo(params, key, x):
        loc, scale = enc.apply(params["enc"], x)
        eps = jax.random.normal(key, loc.shape)
        z = loc + scale * eps  # reparameterized sample
        logits = dec.apply(params["dec"], z)
        # E_q[log p(x|z)]
        ll = jnp.sum(
            x * jax.nn.log_sigmoid(logits)
            + (1 - x) * jax.nn.log_sigmoid(-logits)
        )
        # KL(q(z|x) || N(0, I)) in closed form
        kl = 0.5 * jnp.sum(
            loc**2 + scale**2 - 2 * jnp.log(scale) - 1.0
        )
        return -(ll - kl)

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(neg_elbo)(params, key, x)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.key(seed)
    for _ in range(num_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    return np.asarray(losses) / x.shape[0]


def main(args):
    x = make_data(jax.random.key(args.seed), args.batch_size)
    pyro_losses = run_pyro(x, args.num_steps, args.lr, args.seed)
    raw_losses = run_raw(x, args.num_steps, args.lr, args.seed)
    n_tail = max(1, args.num_steps // 5)
    p_tail = float(pyro_losses[-n_tail:].mean())
    r_tail = float(raw_losses[-n_tail:].mean())
    print(f"pyro_tpu SVI  final ELBO/datum: {-p_tail:10.3f}")
    print(f"hand-derived  final ELBO/datum: {-r_tail:10.3f}")
    rel_gap = abs(p_tail - r_tail) / abs(r_tail)
    print(f"relative gap: {rel_gap:.3%}")
    # Monte Carlo KL (pyro) vs analytic KL (raw) differ stochastically;
    # the training trajectories must still agree closely
    if args.num_steps >= 200:
        assert rel_gap < 0.05, (p_tail, r_tail)
    return p_tail, r_tail


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="pyro_tpu VAE vs handwritten-JAX VAE"
    )
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
