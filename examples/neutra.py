"""NeuTra: neural transport reparameterization for HMC
(ref ``examples/neutra.py``; Hoffman et al. 2019).

Fit a flow-based autoguide to a badly-shaped posterior (the banana), then
run NUTS in the flow's whitened latent space via ``NeuTraReparam`` — the
TPU-native win is that the flow and the NUTS leapfrogs all fuse into the
same jitted program.

Run: ``python examples/neutra.py -n 300``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import AutoIAFNormal
from pyro_tpu.infer.reparam import NeuTraReparam
from pyro_tpu.optim import ClippedAdam


def banana_model():
    x = pyro.sample("x", dist.Normal(0.0, 1.0))
    pyro.sample("y", dist.Normal(0.3 * (x**2 - 1.0), 0.2))


def main(args):
    pyro.set_rng_seed(args.seed)
    pyro.clear_param_store()

    # 1. vanilla NUTS for comparison
    mcmc = MCMC(
        NUTS(banana_model),
        num_samples=args.num_samples,
        warmup_steps=args.num_samples,
    )
    mcmc.run(rng_key=jax.random.key(args.seed))
    vanilla = mcmc.get_samples()

    # 2. train a flow guide
    guide = AutoIAFNormal(banana_model, num_transforms=2, hidden_dim=32)
    svi = SVI(
        banana_model, guide, ClippedAdam({"lr": 0.003}), Trace_ELBO()
    )
    losses = [svi.step() for _ in range(args.num_svi_steps)]
    print(f"flow ELBO: {losses[0]:.2f} -> {losses[-1]:.2f}")

    # 3. NUTS through the trained flow
    neutra = NeuTraReparam(guide)
    neutra_model = poutine.reparam(
        banana_model, config=lambda site: neutra
    )
    mcmc2 = MCMC(
        NUTS(neutra_model),
        num_samples=args.num_samples,
        warmup_steps=args.num_samples,
    )
    mcmc2.run(rng_key=jax.random.key(args.seed + 1))
    zs = mcmc2.get_samples()["_neutra_latent"]
    transformed = jax.vmap(neutra.transform_sample)(zs)

    for name, samples in [
        ("vanilla x", vanilla["x"]),
        ("neutra x", transformed["x"]),
    ]:
        s = np.asarray(samples)
        print(f"{name}: mean {s.mean():+.3f} sd {s.std():.3f}")
    return transformed


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="NeuTra HMC")
    p.add_argument("-n", "--num-samples", default=300, type=int)
    p.add_argument("--num-svi-steps", default=1000, type=int)
    p.add_argument("--seed", default=0, type=int)
    main(p.parse_args())
