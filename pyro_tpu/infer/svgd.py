"""Stein variational gradient descent.

Ref ``pyro/infer/svgd.py:196`` with RBF (``:63``) and IMQ (``:123``)
steinkernels; particles are a vectorized plate over the latent space.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.flatten_util
import jax.numpy as jnp

from .. import poutine
from ..distributions.transforms import biject_to
from ..params.param_store import get_param_store
from ..poutine.util import prune_subsample_sites, site_is_subsample
from .mcmc.util import get_potential_fn


class SteinKernel:
    def log_kernel_and_grad(self, particles):
        raise NotImplementedError


class RBFSteinKernel(SteinKernel):
    """RBF kernel with median-heuristic bandwidth (ref ``svgd.py:63``)."""

    def __init__(self, bandwidth_factor=None):
        self.bandwidth_factor = bandwidth_factor

    def _bandwidth(self, sq_dists, n):
        med = jnp.median(sq_dists)
        h = med / jnp.log(n + 1.0)
        if self.bandwidth_factor is not None:
            h = h * self.bandwidth_factor
        return jnp.clip(h, 1e-8)

    def kernel(self, particles):
        diff = particles[:, None, :] - particles[None, :, :]
        sq = jnp.sum(diff**2, -1)
        h = self._bandwidth(sq, particles.shape[0])
        K = jnp.exp(-sq / h)
        # grad_x k(x, y) wrt first arg
        gradK = -2.0 / h * diff * K[..., None]
        return K, gradK


class IMQSteinKernel(SteinKernel):
    """Inverse multi-quadric kernel (ref ``svgd.py:123``)."""

    def __init__(self, alpha=0.5, beta=-0.5, bandwidth_factor=None):
        assert alpha > 0 and beta < 0
        self.alpha = alpha
        self.beta = beta
        self.bandwidth_factor = bandwidth_factor

    def kernel(self, particles):
        diff = particles[:, None, :] - particles[None, :, :]
        sq = jnp.sum(diff**2, -1)
        med = jnp.clip(
            jnp.median(sq) / jnp.log(particles.shape[0] + 1.0), 1e-8
        )
        if self.bandwidth_factor is not None:
            med = med * self.bandwidth_factor
        base = self.alpha + sq / med
        K = base**self.beta
        gradK = (
            2.0 * self.beta / med * base ** (self.beta - 1)
        )[..., None] * diff
        return K, gradK


class SVGD:
    """Ref ``svgd.py:196``: maintains ``num_particles`` particles per latent
    in the param store; ``step`` applies the Stein variational update."""

    def __init__(
        self,
        model,
        kernel: SteinKernel,
        optim,
        num_particles: int,
        max_plate_nesting: int,
        mode: str = "univariate",
    ):
        self.model = model
        self.kernel = kernel
        self.optim = optim
        self.num_particles = num_particles
        self.max_plate_nesting = max_plate_nesting
        self.mode = mode
        self._initialized = False
        self._rng = jax.random.key(31)

    def _init(self, *args, **kwargs):
        (
            potential_fn,
            postprocess_fn,
            transforms,
            prototype_trace,
            unconstrain,
        ) = get_potential_fn(self.model, args, kwargs)
        self._potential_fn = potential_fn
        self._transforms = transforms
        # initialize particles from the prior
        keys = jax.random.split(self._rng, self.num_particles)

        def draw(key):
            tr = poutine.trace(
                poutine.seed(self.model, rng_key=key)
            ).get_trace(*args, **kwargs)
            tr = prune_subsample_sites(tr)
            return unconstrain(
                {
                    name: tr.nodes[name]["value"]
                    for name in transforms
                }
            )

        particles = jax.vmap(draw)(keys)
        flat, unravel = jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda x: x[0], particles)
        )
        self._unravel = unravel
        self._particles = jax.vmap(
            lambda p: jax.flatten_util.ravel_pytree(p)[0]
        )(particles)
        self._opt_state = None
        self._initialized = True

    def get_named_particles(self) -> Dict[str, jnp.ndarray]:
        un = jax.vmap(self._unravel)(self._particles)
        return {
            name: self._transforms[name](u) for name, u in un.items()
        }

    def step(self, *args, **kwargs):
        """One Stein update (ref ``svgd.py:270``)."""
        if not self._initialized:
            self._init(*args, **kwargs)

        def phi(particles):
            # score of the target at each particle
            logp_grad = jax.vmap(
                jax.grad(lambda z: -self._potential_fn(self._unravel(z)))
            )(particles)
            K, gradK = self.kernel.kernel(particles)
            n = particles.shape[0]
            drive = K @ logp_grad / n
            repulse = jnp.sum(gradK, axis=0) / n
            return drive + repulse

        update = phi(self._particles)
        if self._opt_state is None:
            self._opt_state = {"particles": self.optim._resolve("particles").init(self._particles)}
        tx = self.optim._resolve("particles")
        upd, self._opt_state["particles"] = tx.update(
            -update, self._opt_state["particles"], self._particles
        )
        import optax

        self._particles = optax.apply_updates(self._particles, upd)
        return float(jnp.mean(jnp.abs(update)))
