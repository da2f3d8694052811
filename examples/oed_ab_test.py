"""Optimal experiment design for an A/B test.

Ref ``examples/contrib/oed/ab_test.py``: a Gaussian linear model whose
design matrix one-hot encodes assignment of N participants to two
groups.  For each candidate allocation we estimate the expected
information gain (EIG) about the group means and compare against the
closed-form linear-Gaussian answer (``analytic_posterior_cov``).

The reference estimates average posterior entropy with variational
inference + GP Bayesian optimization; here every candidate design is
scored in one vmapped NMC-EIG sweep (cheap on accelerators), which the
reference's own docs recommend when y and theta are both continuous.

Run:  python examples/oed_ab_test.py
"""

from __future__ import annotations

import argparse
import math

import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.oed.eig import posterior_eig
from pyro_tpu.contrib.oed.glmm import (
    analytic_posterior_cov,
    group_assignment_matrix,
    zero_mean_unit_obs_sd_lm,
)
from pyro_tpu.distributions import constraints

N = 100  # participants
PRIOR_SDS = jnp.array([10.0, 2.5])


def true_ape(ns):
    """Analytic average posterior entropy per allocation (ref :64-75)."""
    designs = [group_assignment_matrix(jnp.array([n1, N - n1])) for n1 in ns]
    true_costs = []
    prior_cov = jnp.diag(PRIOR_SDS**2)
    for x in designs:
        posterior_cov = analytic_posterior_cov(prior_cov, x, 1.0)
        sign, logdet = np.linalg.slogdet(np.asarray(posterior_cov))
        entropy = 0.5 * logdet + 0.5 * 2 * (1 + math.log(2 * math.pi))
        true_costs.append(float(entropy))
    return true_costs


def main(args):
    pyro.set_rng_seed(args.seed)
    model, guide = zero_mean_unit_obs_sd_lm(PRIOR_SDS)
    ns = list(range(0, N + 1, args.step))

    # prior entropy minus EIG = average posterior entropy
    prior_cov = np.diag(np.asarray(PRIOR_SDS) ** 2)
    prior_entropy = 0.5 * np.linalg.slogdet(prior_cov)[1] + (
        1 + math.log(2 * math.pi)
    )

    # amortized linear posterior guide q(w | y) = N(Ay + b, diag(s)) —
    # exact for this linear-Gaussian model, trained by the Barber-Agakov
    # bound (the reference's vi_eig approach, ref ab_test.py:62-75)
    def posterior_guide(y_dict, design, observation_labels, target_labels):
        y = y_dict["y"]
        A = pyro.param("A", jnp.zeros((2, y.shape[-1])))
        bias = pyro.param("bias", jnp.zeros(2))
        scale = pyro.param(
            "scale", jnp.ones(2), constraint=constraints.positive
        )
        loc = jnp.einsum("pn,...n->...p", A, y) + bias
        pyro.sample("w", dist.Normal(loc, scale).to_event(1))

    est_ape, analytic = [], true_ape(ns)
    for n1 in ns:
        pyro.clear_param_store()
        design = group_assignment_matrix(jnp.array([n1, N - n1]))
        # posterior_eig returns E[log q(w|y)] (EIG minus the prior-entropy
        # constant); at the optimum -E[log q] equals the average posterior
        # entropy.
        elogq = float(
            posterior_eig(
                model,
                design,
                observation_labels="y",
                target_labels="w",
                num_samples=args.num_inner,
                num_steps=args.num_outer,
                guide=posterior_guide,
            )
        )
        est_ape.append(-elogq)
    for n1, est, true in zip(ns, est_ape, analytic):
        print(
            f"allocation ({n1:3d}, {N - n1:3d}): APE est {est:7.3f}  "
            f"analytic {true:7.3f}"
        )
    best = ns[int(np.argmin(est_ape))]
    best_true = ns[int(np.argmin(analytic))]
    print(f"optimal allocation: estimated n1={best}, analytic n1={best_true}")
    return best, best_true


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--step", type=int, default=25)
    p.add_argument("--num-outer", type=int, default=400)
    p.add_argument("--num-inner", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
