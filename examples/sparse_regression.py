"""Sparse Bayesian linear regression via the kernel interaction trick.

Ref ``examples/sparse_regression.py`` (pyro-ppl v1.9.1): MAP estimation of
kernel hyperparameters for a quadratic regressor whose sparsity-inducing
prior satisfies a "strong hierarchy" condition [1], then analytic recovery
of the active singleton/quadratic weights from the fitted GP (theorem 5.1
of [1]).

TPU-native notes: the whole MAP loop runs as one jitted SVI scan
(``SVI.run_steps``); the posterior-statistics pass is pure ``jnp`` linear
algebra (one Cholesky solve feeding every probe), executed in float64 via
``jax.experimental.enable_x64`` only if available, else float32.

[1] Raj Agrawal, Jonathan H. Huggins, Brian Trippe, Tamara Broderick
    "The Kernel Interaction Trick: Fast Bayesian Discovery of Pairwise
    Interactions in High Dimensions" https://arxiv.org/abs/1905.06501

Run:  python examples/sparse_regression.py --num-steps 200
"""

from __future__ import annotations

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import AutoDelta, init_to_median
from pyro_tpu.optim import ClippedAdam


def _pairwise_features(X):
    """Map x -> (x_i * x_j) for i < j, shape (N, P(P-1)/2)."""
    P = X.shape[-1]
    iu, ju = jnp.triu_indices(P, k=1)
    return X[:, iu] * X[:, ju]


def kernel(X, Z, eta1, eta2, c):
    """The kernel corresponding to the quadratic regressor (ref :52-58).

    The reference computes ``0.5*eta2^2*(1+x.z)^2 - 0.5*eta2^2*(x^2.z^2)
    + (eta1^2-eta2^2)*(x.z) + c^2 - 0.5*eta2^2``, which cancels
    catastrophically in float32 (the Gram matrix acquires ~-1e-4
    eigenvalues and Cholesky NaNs out mid-optimization).  Expanding,
    this equals the explicit PSD feature-map Gram

        k(x, z) = eta2^2 * sum_{i<j} (x_i x_j)(z_i z_j)
                  + eta1^2 * (x . z) + c^2,

    which is cancellation-free and a single large matmul (MXU-friendly).
    """
    kp = _pairwise_features(X) @ _pairwise_features(Z).T
    return eta2**2 * kp + eta1**2 * (X @ Z.T) + c**2


def model(X, Y, hypers, jitter=1.0e-3):
    # NOTE jitter default is 1e-3 (ref uses 1e-4): the k1+k2+k3+k4 kernel
    # decomposition cancels catastrophically in float32, leaving the Gram
    # matrix with ~-1e-4 eigenvalues; the larger jitter restores PSD.
    S, P, N = hypers["expected_sparsity"], X.shape[1], X.shape[0]

    sigma = pyro.sample("sigma", dist.HalfNormal(hypers["alpha3"]))
    phi = sigma * (S / math.sqrt(N)) / (P - S)
    eta1 = pyro.sample("eta1", dist.HalfCauchy(phi))

    msq = pyro.sample(
        "msq", dist.InverseGamma(hypers["alpha1"], hypers["beta1"])
    )
    xisq = pyro.sample(
        "xisq", dist.InverseGamma(hypers["alpha2"], hypers["beta2"])
    )

    eta2 = eta1**2 * jnp.sqrt(xisq) / msq

    lam = pyro.sample(
        "lambda", dist.HalfCauchy(jnp.ones(P)).to_event(1)
    )
    kappa = jnp.sqrt(msq) * lam / jnp.sqrt(msq + (eta1 * lam) ** 2)
    kX = kappa * X

    k = kernel(kX, kX, eta1, eta2, hypers["c"])
    k = 0.5 * (k + k.T) + (sigma**2 + jitter) * jnp.eye(N)

    pyro.sample(
        "Y",
        dist.MultivariateNormal(jnp.zeros(N), covariance_matrix=k),
        obs=Y,
    )


def _np_kernel(X, Z, eta1, eta2, c):
    """Float64 host-side copy of :func:`kernel` for the posterior stats."""
    P = X.shape[-1]
    iu, ju = np.triu_indices(P, k=1)
    kp = (X[:, iu] * X[:, ju]) @ (Z[:, iu] * Z[:, ju]).T
    return eta2**2 * kp + eta1**2 * (X @ Z.T) + c**2


def _probe_stats(kprobe, kX, k_xx_inv_Y, k_xx_inv, eta1, eta2, c, vec):
    """Posterior mean/std of weight probes (ref :101-213, theorem 5.1)."""
    k_probeX = _np_kernel(kprobe, kX, eta1, eta2, c)
    k_prbprb = _np_kernel(kprobe, kprobe, eta1, eta2, c)
    G = vec.shape[0]
    mu = (k_probeX @ k_xx_inv_Y).reshape(-1, G)
    mu = (mu * vec).sum(-1)
    var = k_prbprb - k_probeX @ k_xx_inv @ k_probeX.T
    M = mu.shape[0]
    var = var.reshape(M, G, M, G)
    var = np.diagonal(var, axis1=0, axis2=2)  # (G, G, M)
    std = np.sqrt(
        np.clip(
            (var * vec[:, None] * vec[None, :, None]).sum((0, 1)),
            0.0,
            None,
        )
    )
    return mu, std


def compute_posterior_stats(
    X, Y, msq, lam, eta1, xisq, c, sigma, jitter=1.0e-3
):
    """Recover active singleton and quadratic weights (ref :101-213).

    Runs on host in float64 (the reference casts to ``.double()`` here,
    ref :329-339): in float32 the posterior variances of the probes
    cancel to ~0 and every dimension looks "significant".
    """
    X, Y = np.asarray(X, np.float64), np.asarray(Y, np.float64)
    msq, lam, eta1, xisq, c, sigma = (
        np.asarray(v, np.float64)
        for v in (msq, lam, eta1, xisq, c, sigma)
    )
    N, P = X.shape
    eta2 = eta1**2 * np.sqrt(xisq) / msq
    kappa = np.sqrt(msq) * lam / np.sqrt(msq + (eta1 * lam) ** 2)
    kX = kappa * X

    k_xx = _np_kernel(kX, kX, eta1, eta2, c) + (
        jitter + sigma**2
    ) * np.eye(N)
    k_xx_inv = np.linalg.inv(k_xx)
    k_xx_inv_Y = k_xx_inv @ Y

    # singleton probes: +e_i and -e_i
    probe = np.stack([np.eye(P), -np.eye(P)], axis=1)  # (P, 2, P)
    kprobe = (kappa * probe).reshape(-1, P)
    vec = np.array([0.5, -0.5])
    mu, std = _probe_stats(
        kprobe, kX, k_xx_inv_Y, k_xx_inv, eta1, eta2, c, vec
    )
    active = np.asarray(
        ((mu - 4.0 * std) > 0.0) | ((mu + 4.0 * std) < 0.0)
    ).nonzero()[0]
    print("Identified the following active dimensions:", active)
    print(
        "Mean estimate for active singleton weights:\n",
        np.asarray(mu)[active],
    )

    M = len(active)
    if M < 2:
        return active, []

    # quadratic probes over active pairs: (+,+), (+,-), (-,+), (-,-)
    li, ri = np.triu_indices(M, k=1)
    left_dims, right_dims = active[li], active[ri]
    n_pairs = len(left_dims)
    probe = np.zeros((n_pairs, 4, P))
    for g, v in enumerate([1.0, 1.0, -1.0, -1.0]):
        probe[np.arange(n_pairs), g, left_dims] += v
    for g, v in enumerate([1.0, -1.0, 1.0, -1.0]):
        probe[np.arange(n_pairs), g, right_dims] += v
    kprobe = (kappa * probe).reshape(-1, P)
    vec = np.array([0.25, -0.25, -0.25, 0.25])
    mu, std = _probe_stats(
        kprobe, kX, k_xx_inv_Y, k_xx_inv, eta1, eta2, c, vec
    )
    keep = (
        (((mu - 4.0 * std) > 0.0) | ((mu + 4.0 * std) < 0.0))
        & (np.abs(mu) > 1.0e-4)
    ).nonzero()[0]
    quads = [
        (int(left_dims[i]), int(right_dims[i])) for i in keep
    ]
    return active, quads


def get_data(key, N=20, P=10, S=2, Q=2, sigma_obs=0.15):
    """Synthetic dataset with S singleton + Q(Q-1)/2 quadratic weights."""
    assert S < P and P > 3 and S > 2 and 1 < Q <= S
    k1, k2, k3, k4 = jax.random.split(key, 4)
    X = jax.random.normal(k1, (N, P))
    singleton_weights = 2.0 * jax.random.uniform(k2, (S,)) - 1.0
    Y = X[:, :S] @ singleton_weights
    expected_quad_dims = []
    qw = 2.0 * jax.random.uniform(k3, (Q, Q)) - 1.0
    for d1 in range(Q):
        for d2 in range(d1 + 1, Q):
            expected_quad_dims.append((d1, d2))
            Y = Y + qw[d1, d2] * X[:, d1] * X[:, d2]
    Y = Y - Y.mean()
    y_std1 = Y.std()
    Y = Y / y_std1 + sigma_obs * jax.random.normal(k4, (N,))
    Y = Y - Y.mean()
    y_std2 = Y.std()
    Y = Y / y_std2
    return X, Y, singleton_weights / (y_std1 * y_std2), expected_quad_dims


def init_loc_fn(site):
    value = init_to_median(site, num_samples=50)
    # keep the initial sigma small to avoid bad local optima (ref :255-261)
    if site["name"] == "sigma":
        value = 0.1 * value
    return value


def main(args):
    hypers = {
        "expected_sparsity": max(1.0, args.num_dimensions / 10),
        "alpha1": 3.0,
        "beta1": 1.0,
        "alpha2": 3.0,
        "beta2": 1.0,
        "alpha3": 1.0,
        "c": 1.0,
    }
    P, S, Q = (
        args.num_dimensions,
        args.active_dimensions,
        args.quadratic_dimensions,
    )
    X, Y, expected_thetas, expected_quad_dims = get_data(
        jax.random.key(1), N=args.num_data, P=P, S=S, Q=Q,
        sigma_obs=args.sigma,
    )

    # multi-restart MAP: pick the best-initialized AutoDelta (ref :287-300)
    loss_fn = Trace_ELBO().loss
    init_losses = []
    for restart in range(args.num_restarts):
        pyro.clear_param_store()
        pyro.set_rng_seed(restart)
        guide = AutoDelta(model, init_loc_fn=init_loc_fn)
        init_losses.append(float(loss_fn(model, guide, X, Y, hypers)))
    best = int(np.argmin(init_losses))
    pyro.clear_param_store()
    pyro.set_rng_seed(best)
    guide = AutoDelta(model, init_loc_fn=init_loc_fn)

    svi = SVI(
        model,
        guide,
        ClippedAdam({"lr": args.lr, "lrd": 0.999}),
        Trace_ELBO(),
    )
    print("Beginning MAP optimization...")
    report = max(1, args.num_steps // 10)
    for start in range(0, args.num_steps, report):
        n = min(report, args.num_steps - start)
        losses = svi.run_steps(n, X, Y, hypers)
        print(
            "[step %04d]  loss: %.5f"
            % (start + n - 1, float(losses[-1]) / args.num_data)
        )

    print("Expected singleton thetas:\n", np.asarray(expected_thetas))
    median = guide.median()
    active_dims, active_quad_dims = compute_posterior_stats(
        X,
        Y,
        median["msq"],
        median["lambda"],
        median["eta1"],
        median["xisq"],
        jnp.asarray(hypers["c"]),
        median["sigma"],
    )
    expected_active = set(range(S))
    tp = len(set(active_dims.tolist()) & expected_active)
    fp = len(set(active_dims.tolist()) - expected_active)
    fn = len(expected_active - set(active_dims.tolist()))
    print("[SUMMARY STATS]")
    print(f"Singletons (tp, fp, fn): ({tp}, {fp}, {fn})")
    tq = len(set(active_quad_dims) & set(expected_quad_dims))
    fq = len(set(active_quad_dims) - set(expected_quad_dims))
    nq = len(set(expected_quad_dims) - set(active_quad_dims))
    print(f"Quadratic  (tp, fp, fn): ({tq}, {fq}, {nq})")
    return (tp, fp, fn), (tq, fq, nq)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Krylov KIT")
    parser.add_argument("--num-data", type=int, default=750)
    parser.add_argument("--num-steps", type=int, default=1000)
    parser.add_argument("--num-dimensions", type=int, default=100)
    parser.add_argument("--num-restarts", type=int, default=10)
    parser.add_argument("--sigma", type=float, default=0.05)
    parser.add_argument("--active-dimensions", type=int, default=10)
    parser.add_argument("--quadratic-dimensions", type=int, default=5)
    parser.add_argument("--lr", type=float, default=0.3)
    main(parser.parse_args())
