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
from pyro_tpu.contrib.oed.eig import nmc_eig
from pyro_tpu.contrib.oed.glmm import (
    analytic_posterior_cov,
    group_assignment_matrix,
    zero_mean_unit_obs_sd_lm,
)

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

    est_ape, analytic = [], true_ape(ns)
    for n1 in ns:
        design = group_assignment_matrix(jnp.array([n1, N - n1]))
        eig = float(
            nmc_eig(
                model,
                design,
                observation_labels="y",
                target_labels="w",
                N=args.num_outer,
                M=args.num_inner,
            )
        )
        est_ape.append(prior_entropy - eig)
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
