"""GP conditional + training helper (ref ``pyro/contrib/gp/util.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def conditional(
    Xnew,
    X,
    kernel,
    f_loc,
    f_scale_tril=None,
    Lff=None,
    full_cov: bool = False,
    whiten: bool = False,
    jitter: float = 1e-6,
):
    """p(f(Xnew) | f(X) ~ N(f_loc, f_scale_tril)) (ref ``util.py:conditional``).

    Returns (loc, cov) with cov full or diagonal.
    """
    N = X.shape[0]
    M = Xnew.shape[0]
    latent_shape = f_loc.shape[:-1]
    if Lff is None:
        Kff = kernel(X) + jitter * jnp.eye(N)
        Lff = jnp.linalg.cholesky(Kff)
    Kfs = kernel(X, Xnew)  # (N, M)

    # pack features
    f_loc_2D = f_loc.reshape(-1, N).T  # (N, L)
    if whiten:
        v_2D = f_loc_2D
        W = solve_triangular(Lff, Kfs, lower=True)  # (N, M)
        loc = (W.T @ v_2D).T.reshape(latent_shape + (M,))
    else:
        pack = solve_triangular(Lff, f_loc_2D, lower=True)
        W = solve_triangular(Lff, Kfs, lower=True)
        loc = (W.T @ pack).T.reshape(latent_shape + (M,))

    if full_cov:
        Kss = kernel(Xnew)
        Qss = W.T @ W
        cov = Kss - Qss
    else:
        Kssdiag = kernel(Xnew, diag=True)
        Qssdiag = jnp.sum(W**2, axis=0)
        # floor at jitter: sqrt(0) has an infinite gradient
        cov = jnp.clip(Kssdiag - Qssdiag, jitter)

    if f_scale_tril is not None:
        # add variance of f: W' S S' W
        S_2D = f_scale_tril.reshape(-1, N, f_scale_tril.shape[-1])[0] if f_scale_tril.ndim > 2 else f_scale_tril
        if whiten:
            V = W.T @ S_2D  # (M, N)
        else:
            Linv_S = solve_triangular(Lff, S_2D, lower=True)
            V = W.T @ Linv_S
        if full_cov:
            cov = cov + V @ V.T
        else:
            cov = cov + jnp.sum(V**2, axis=-1)
    return loc, cov


def train(gpmodule, optimizer=None, loss_fn=None, num_steps: int = 1000, rng_key=None):
    """Fit a GP module with SVI (ref ``util.py:train``)."""
    from ...infer import SVI, Trace_ELBO, TraceMeanField_ELBO
    from ...optim import Adam

    optimizer = optimizer or Adam({"lr": 0.01})
    loss = loss_fn or Trace_ELBO()
    svi = SVI(gpmodule.model, gpmodule.guide, optimizer, loss)
    losses = []
    for _ in range(num_steps):
        losses.append(svi.step())
    return losses
