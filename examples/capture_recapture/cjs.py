"""Cormack-Jolly-Seber (CJS) capture-recapture models
(ref ``examples/capture_recapture/cjs.py``): five model variants for
open-population survival analysis, with the latent alive/dead states
z_t summed out exactly by parallel enumeration (or sampled by TMC).

The reference ships the classic European dipper / meadow-vole CSV
datasets; since we keep the repo dataset-free we synthesize a
dipper-sized capture history (N animals, T seasons) from known
survival/recapture probabilities, so convergence can be eyeballed
against the truth.

The T-step temporal loop unrolls at trace time into one static XLA
graph; ``pyro.markov`` keeps the enumeration dims at O(markov window)
rather than O(T), and the whole multi-particle ELBO is a single
compiled program per step.

Run: ``python examples/capture_recapture/cjs.py --model 1 -n 100``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import SVI, TraceEnum_ELBO, TraceTMC_ELBO
from pyro_tpu.infer.autoguide import AutoDiagonalNormal
from pyro_tpu.optim import Adam


def model_1(capture_history, sex):
    """Fixed effects only: scalar survival phi and recapture rho."""
    N, T = capture_history.shape
    phi = pyro.sample("phi", dist.Uniform(0.0, 1.0))
    rho = pyro.sample("rho", dist.Uniform(0.0, 1.0))

    with pyro.plate("animals", N, dim=-1):
        z = jnp.ones(N)
        # mask out log-probs before an individual's first capture
        first_capture_mask = jnp.zeros(N, dtype=bool)
        for t in pyro.markov(range(T)):
            with poutine.mask(mask=first_capture_mask):
                mu_z_t = first_capture_mask * phi * z + (
                    1.0 - first_capture_mask
                )
                z = pyro.sample(
                    f"z_{t}",
                    dist.Bernoulli(mu_z_t),
                    infer={"enumerate": "parallel"},
                )
                pyro.sample(
                    f"y_{t}", dist.Bernoulli(rho * z), obs=capture_history[:, t]
                )
            first_capture_mask = first_capture_mask | capture_history[
                :, t
            ].astype(bool)


def model_2(capture_history, sex):
    """Time-varying survival phi_t, each a fixed effect."""
    N, T = capture_history.shape
    rho = pyro.sample("rho", dist.Uniform(0.0, 1.0))

    z = jnp.ones(N)
    first_capture_mask = jnp.zeros(N, dtype=bool)
    animals_plate = pyro.plate("animals", N, dim=-1)
    for t in pyro.markov(range(T)):
        # phi_t is shared across animals, so it samples outside the plate
        phi_t = (
            pyro.sample(f"phi_{t}", dist.Uniform(0.0, 1.0)) if t > 0 else 1.0
        )
        with animals_plate, poutine.mask(mask=first_capture_mask):
            mu_z_t = first_capture_mask * phi_t * z + (1.0 - first_capture_mask)
            z = pyro.sample(
                f"z_{t}",
                dist.Bernoulli(mu_z_t),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(
                f"y_{t}", dist.Bernoulli(rho * z), obs=capture_history[:, t]
            )
        first_capture_mask = first_capture_mask | capture_history[:, t].astype(
            bool
        )


def model_3(capture_history, sex):
    """Time-varying survival as a random effect in logit space."""
    N, T = capture_history.shape
    phi_mean = pyro.sample("phi_mean", dist.Uniform(0.0, 1.0))
    phi_logit_mean = jnp.log(phi_mean) - jnp.log1p(-phi_mean)
    phi_sigma = pyro.sample("phi_sigma", dist.Uniform(0.0, 10.0))
    rho = pyro.sample("rho", dist.Uniform(0.0, 1.0))

    z = jnp.ones(N)
    first_capture_mask = jnp.zeros(N, dtype=bool)
    animals_plate = pyro.plate("animals", N, dim=-1)
    for t in pyro.markov(range(T)):
        phi_logit_t = (
            pyro.sample(f"phi_logit_{t}", dist.Normal(phi_logit_mean, phi_sigma))
            if t > 0
            else jnp.asarray(0.0)
        )
        phi_t = jax.nn.sigmoid(phi_logit_t)
        with animals_plate, poutine.mask(mask=first_capture_mask):
            mu_z_t = first_capture_mask * phi_t * z + (1.0 - first_capture_mask)
            z = pyro.sample(
                f"z_{t}",
                dist.Bernoulli(mu_z_t),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(
                f"y_{t}", dist.Bernoulli(rho * z), obs=capture_history[:, t]
            )
        first_capture_mask = first_capture_mask | capture_history[:, t].astype(
            bool
        )


def model_4(capture_history, sex):
    """Group-level (sex) fixed effects for survival."""
    N, T = capture_history.shape
    phi_male = pyro.sample("phi_male", dist.Uniform(0.0, 1.0))
    phi_female = pyro.sample("phi_female", dist.Uniform(0.0, 1.0))
    # per-animal phi from its sex (female = 0, male = 1)
    phi = sex * phi_male + (1.0 - sex) * phi_female
    rho = pyro.sample("rho", dist.Uniform(0.0, 1.0))

    with pyro.plate("animals", N, dim=-1):
        z = jnp.ones(N)
        first_capture_mask = jnp.zeros(N, dtype=bool)
        for t in pyro.markov(range(T)):
            with poutine.mask(mask=first_capture_mask):
                mu_z_t = first_capture_mask * phi * z + (
                    1.0 - first_capture_mask
                )
                z = pyro.sample(
                    f"z_{t}",
                    dist.Bernoulli(mu_z_t),
                    infer={"enumerate": "parallel"},
                )
                pyro.sample(
                    f"y_{t}", dist.Bernoulli(rho * z), obs=capture_history[:, t]
                )
            first_capture_mask = first_capture_mask | capture_history[
                :, t
            ].astype(bool)


def model_5(capture_history, sex):
    """Fixed group + fixed time effects: logit(phi_t) = beta*sex + gamma_t."""
    N, T = capture_history.shape
    phi_beta = pyro.sample("phi_beta", dist.Normal(0.0, 10.0))
    phi_beta = sex * phi_beta
    rho = pyro.sample("rho", dist.Uniform(0.0, 1.0))

    z = jnp.ones(N)
    first_capture_mask = jnp.zeros(N, dtype=bool)
    animals_plate = pyro.plate("animals", N, dim=-1)
    for t in pyro.markov(range(T)):
        phi_gamma_t = (
            pyro.sample(f"phi_gamma_{t}", dist.Normal(0.0, 10.0))
            if t > 0
            else 0.0
        )
        phi_t = jax.nn.sigmoid(phi_beta + phi_gamma_t)
        with animals_plate, poutine.mask(mask=first_capture_mask):
            mu_z_t = first_capture_mask * phi_t * z + (1.0 - first_capture_mask)
            z = pyro.sample(
                f"z_{t}",
                dist.Bernoulli(mu_z_t),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(
                f"y_{t}", dist.Bernoulli(rho * z), obs=capture_history[:, t]
            )
        first_capture_mask = first_capture_mask | capture_history[:, t].astype(
            bool
        )


models = {
    name[len("model_") :]: model
    for name, model in list(globals().items())
    if name.startswith("model_")
}


def simulate_capture_history(N, T, phi=0.75, rho=0.6, seed=0):
    """Synthetic CJS data: every animal is first marked at a random
    season, survives each subsequent season w.p. phi, and (while alive)
    is recaptured w.p. rho."""
    rng = np.random.RandomState(seed)
    first = rng.randint(0, T - 1, size=N)
    alive = np.zeros((N, T), dtype=bool)
    y = np.zeros((N, T), dtype=np.float32)
    sex = rng.randint(0, 2, size=N).astype(np.float32)
    for i in range(N):
        alive[i, first[i]] = True
        y[i, first[i]] = 1.0  # marked on first capture
        for t in range(first[i] + 1, T):
            alive[i, t] = alive[i, t - 1] and (rng.rand() < phi)
            y[i, t] = float(alive[i, t] and (rng.rand() < rho))
    return jnp.asarray(y), jnp.asarray(sex)


def main(args):
    pyro.set_rng_seed(0)
    pyro.clear_param_store()

    capture_history, sex = simulate_capture_history(
        args.num_animals, args.num_seasons, seed=0
    )
    N, T = capture_history.shape
    print(
        f"Simulated capture history for {N} individuals over {T} seasons "
        "(true phi=0.75, rho=0.6)."
    )

    model = models[args.model]

    # expose only the continuous latents (named phi*/rho) to the guide
    def expose_fn(msg):
        return msg["name"][0:3] in ["phi", "rho"]

    guide = AutoDiagonalNormal(poutine.block(model, expose_fn=expose_fn))

    optim = Adam({"lr": args.learning_rate})
    if args.tmc:
        elbo = TraceTMC_ELBO(max_plate_nesting=1)
        tmc_model = poutine.infer_config(
            model,
            lambda msg: (
                {"num_samples": args.tmc_num_samples, "expand": False}
                if msg["infer"].get("enumerate", None) == "parallel"
                else {}
            ),
        )
        svi = SVI(tmc_model, guide, optim, elbo)
    else:
        elbo = TraceEnum_ELBO(
            max_plate_nesting=1,
            num_particles=args.num_particles,
            vectorize_particles=True,
        )
        svi = SVI(model, guide, optim, elbo)

    losses = []
    for step in range(args.num_steps):
        loss = svi.step(capture_history, sex)
        losses.append(float(loss))
        if step % 20 == 0:
            print(f"[step {step:4d}] elbo loss = {losses[-1]:.2f}")

    # report posterior medians of the exposed latents
    median = guide.median()
    for name in sorted(median):
        val = np.asarray(median[name])
        if val.ndim == 0:
            print(f"  posterior median {name} = {float(val):.3f}")
    return losses


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="CJS capture-recapture")
    parser.add_argument("-m", "--model", default="1", type=str)
    parser.add_argument("-n", "--num-steps", default=200, type=int)
    parser.add_argument("--num-animals", default=100, type=int)
    parser.add_argument("--num-seasons", default=7, type=int)
    parser.add_argument("--num-particles", default=8, type=int)
    parser.add_argument("-lr", "--learning-rate", default=0.02, type=float)
    parser.add_argument("--tmc", action="store_true")
    parser.add_argument("--tmc-num-samples", default=8, type=int)
    main(parser.parse_args())
