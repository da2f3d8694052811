"""Additional divergence losses: tail-adaptive f-divergence, MMD, energy
distance.

Ref ``pyro/infer/trace_tail_adaptive_elbo.py:12`` (Wang, Liu & Liu 2018),
``pyro/infer/trace_mmd.py:22`` (MMD-VAE / InfoVAE), and
``pyro/infer/energy_distance.py:29`` (likelihood-free energy score).
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp

from .. import poutine
from ..distributions.util import is_identically_zero
from ..poutine.util import prune_subsample_sites, site_is_subsample
from .elbo import ELBO
from .enum import get_importance_trace


class TraceTailAdaptive_ELBO(ELBO):
    """Tail-adaptive f-divergence (ref ``trace_tail_adaptive_elbo.py``):
    per-particle weights from rank statistics of the log importance
    weights, exponent ``tail_adaptive_beta`` in [-1, 0)."""

    def __init__(self, num_particles=2, vectorize_particles=True, tail_adaptive_beta=-1.0, **kwargs):
        if num_particles < 2:
            raise ValueError(
                "TraceTailAdaptive_ELBO requires num_particles >= 2"
            )
        assert -1.0 <= tail_adaptive_beta < 0.0
        super().__init__(
            num_particles=num_particles,
            vectorize_particles=False,
            **kwargs,
        )
        self.tail_adaptive_beta = tail_adaptive_beta

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        keys = jax.random.split(rng_key, self.num_particles)
        log_ws = []
        for key in keys:
            model_trace, guide_trace = get_importance_trace(
                "flat", self.max_plate_nesting, model, guide, args, kwargs,
                rng_key=key,
            )
            lw = 0.0
            for site in model_trace.nodes.values():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    lw = lw + site["log_prob_sum"]
            for site in guide_trace.nodes.values():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    lw = lw - site["log_prob_sum"]
            log_ws.append(lw)
        log_ws = jnp.stack(log_ws)
        # rank-based tail-adaptive weights (ref :60-80)
        lw_stop = jax.lax.stop_gradient(log_ws)
        ranks = jnp.sum(
            lw_stop[:, None] >= lw_stop[None, :], axis=-1
        ).astype(log_ws.dtype)
        gammas = (ranks / self.num_particles) ** self.tail_adaptive_beta
        weights = gammas / jnp.sum(gammas)
        return -jnp.sum(weights * log_ws)

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs):
        return float(
            jax.device_get(
                self.differentiable_loss(
                    model, guide, *args, rng_key=rng_key, **kwargs
                )
            )
        )


class Trace_MMD(ELBO):
    """MMD-VAE loss (ref ``trace_mmd.py:22``): reconstruction term plus
    kernelized MMD between marginal guide samples and the prior at each
    latent site.  ``kernel`` is a ``pyro_tpu.contrib.gp`` kernel or a dict
    site -> kernel."""

    def __init__(
        self,
        kernel=None,
        mmd_scale: Union[float, Dict[str, float]] = 1.0,
        num_particles: int = 10,
        max_plate_nesting: float = float("inf"),
        vectorize_particles: bool = True,
        **kwargs,
    ):
        super().__init__(
            num_particles=num_particles,
            max_plate_nesting=max_plate_nesting,
            vectorize_particles=False,
        )
        if kernel is None:
            from ..contrib.gp import kernels

            kernel = kernels.RBF(1)
        self.kernel = kernel
        self.mmd_scale = mmd_scale

    def _get_kernel(self, name):
        return (
            self.kernel[name] if isinstance(self.kernel, dict) else self.kernel
        )

    def _get_scale(self, name):
        return (
            self.mmd_scale[name]
            if isinstance(self.mmd_scale, dict)
            else self.mmd_scale
        )

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        keys = jax.random.split(rng_key, self.num_particles)
        recon = 0.0
        z_guide: Dict[str, list] = {}
        z_prior: Dict[str, list] = {}
        for key in keys:
            model_trace, guide_trace = get_importance_trace(
                "flat", self.max_plate_nesting, model, guide, args, kwargs,
                rng_key=key,
            )
            for name, site in model_trace.nodes.items():
                if site["type"] != "sample" or site["infer"].get(
                    "_do_not_score"
                ):
                    continue
                if site["is_observed"]:
                    recon = recon + site["log_prob_sum"]
                else:
                    z_guide.setdefault(name, []).append(site["value"])
                    z_prior.setdefault(name, []).append(
                        site["fn"].sample(jax.random.fold_in(key, 5))
                    )
        recon = recon / self.num_particles
        mmd = 0.0
        for name in z_guide:
            k = self._get_kernel(name)
            zq = jnp.stack(
                [z.reshape(-1) for z in z_guide[name]]
            )  # (P, D)
            zp = jnp.stack([z.reshape(-1) for z in z_prior[name]])
            Kqq = k(zq)
            Kpp = k(zp)
            Kpq = k(zp, zq)
            mmd = mmd + self._get_scale(name) * (
                Kpp.mean() + Kqq.mean() - 2 * Kpq.mean()
            )
        return -(recon - mmd)

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs):
        return float(
            jax.device_get(
                self.differentiable_loss(
                    model, guide, *args, rng_key=rng_key, **kwargs
                )
            )
        )


class EnergyDistance:
    """Likelihood-free energy-score loss (ref ``energy_distance.py:29``):
    works with heavy-tailed models whose ``log_prob`` is intractable but
    whose ``sample`` is cheap (e.g. Stable).

    loss = E||X - x|| - beta/2 E||X - X'||  over observed sites, plus an
    optional prior ELBO term for latent sites.
    """

    def __init__(self, beta: float = 1.0, num_particles: int = 8, max_plate_nesting: float = float("inf")):
        assert 0 < beta <= 2
        self.beta = beta
        self.num_particles = num_particles
        self.max_plate_nesting = max_plate_nesting

    def _pow(self, diff):
        norm = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
        return norm**self.beta

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        keys = jax.random.split(rng_key, self.num_particles)
        obs_samples: Dict[str, list] = {}
        obs_values: Dict[str, jnp.ndarray] = {}
        prior_term = 0.0
        for key in keys:
            k_g, k_m = jax.random.split(key)
            guide_trace = poutine.trace(
                poutine.seed(guide, rng_key=k_g)
            ).get_trace(*args, **kwargs)
            # resample observed sites from the model given guide latents
            unconditioned = poutine.uncondition(
                poutine.replay(model, trace=guide_trace)
            )
            tr = poutine.trace(
                poutine.seed(unconditioned, rng_key=k_m)
            ).get_trace(*args, **kwargs)
            tr = prune_subsample_sites(tr)
            for name, site in tr.nodes.items():
                if site["type"] != "sample":
                    continue
                if site["infer"].get("was_observed"):
                    obs_samples.setdefault(name, []).append(site["value"])
                    obs_values[name] = site["infer"]["obs"]
        loss = 0.0
        for name, draws in obs_samples.items():
            X = jnp.stack([d.reshape(-1) for d in draws])  # (P, D)
            x = obs_values[name].reshape(-1)
            e_xy = jnp.mean(self._pow(X - x))
            diffs = X[:, None, :] - X[None, :, :]
            e_xx = jnp.sum(self._pow(diffs)) / (
                self.num_particles * (self.num_particles - 1)
            )
            loss = loss + e_xy - 0.5 * e_xx
        return loss

    loss_and_grads = differentiable_loss

    def loss(self, *args, **kwargs):
        raise ValueError(
            "EnergyDistance has no unit loss; use differentiable_loss "
            "(ref energy_distance.py)"
        )

    def __call__(self, model, guide, *args, **kwargs):
        return self.differentiable_loss(model, guide, *args, **kwargs)
