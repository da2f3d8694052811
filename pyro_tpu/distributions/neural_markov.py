"""Autoregressive Gaussian chains with neural conditionals, as ONE site.

TPU-first trace form of the per-step ``pyro.sample`` loop that models
like the deep Markov model use (ref ``examples/dmm.py:287-310`` writes
``z_t ~ Normal(trans(z_{t-1}))`` T times; its guide likewise).  A Python
loop of T sites traces T small width-H matmuls at batch B — each far too
small to tile the MXU — and T separate sample sites for the runtime to
handle.  ``NormalMarkovChain`` collapses the chain into one site with
event shape ``(T, dim)``:

- ``log_prob`` TEACHER-FORCES: given the whole path ``z``, every step's
  conditional parameters are computed in one batched call of the
  conditioner over ``(..., T, dim)`` — a single (B*T, H)-shaped MXU
  matmul set instead of T tiny ones.  This is what scoring a guide
  sample inside an ELBO actually needs, and it is embarrassingly
  parallel: ``p(z) = prod_t N(z_t | cond(z_{t-1}))`` only ever needs
  ``z_{t-1}``, which is known.
- ``rsample`` runs the unavoidable sequential part — the ancestral draw
  — as a ``lax.scan`` whose body is just the conditioner; white noise
  for all T steps is drawn in one call and scanned over.

The joint density is exactly the unrolled loop's, so swapping a per-step
model/guide pair to a single ``NormalMarkovChain`` site changes the
trace shape but not the ELBO being optimized.

Optional ``transforms`` (e.g. the DMM's per-step IAFs, ref
``examples/dmm.py:183-186``) are applied to each step's draw; the
conditioner sees the TRANSFORMED previous value (matching the reference,
where the combiner consumes the previous sampled z).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import constraints
from .distribution import Distribution


class NormalMarkovChain(Distribution):
    """z_{1:T} with ``z_t ~ Normal(cond_fn(z_{t-1}, x_t))``, one site.

    Args:
        cond_fn: ``(z_prev, x_t) -> (loc, scale)``; must broadcast over
            arbitrary leading dims (any stack of ``Dense``-like layers
            does).  ``x_t`` is ``None`` when ``xs`` is not given.
        z_init: ``(..., dim)`` initial conditioner input (e.g. a trained
            ``z_0`` param), broadcast to the batch shape.
        length: T.  Required when ``xs`` is None.
        xs: optional per-step side input ``(batch..., T, k)`` (e.g. the
            DMM guide's backward-RNN summaries).
        transforms: bijectors applied to each step's Normal draw, in
            order (the log-density inverts them, vectorized over T).
    """

    has_rsample = True
    arg_constraints = {}
    support = constraints.independent(constraints.real, 2)

    def __init__(
        self,
        cond_fn: Callable,
        z_init: jnp.ndarray,
        length: Optional[int] = None,
        xs: Optional[jnp.ndarray] = None,
        transforms: Sequence = (),
        validate_args=None,
    ):
        self.cond_fn = cond_fn
        self.z_init = jnp.asarray(z_init)
        self.xs = None if xs is None else jnp.asarray(xs)
        self.transforms = tuple(transforms)
        if self.xs is not None:
            length = self.xs.shape[-2]
        if length is None:
            raise ValueError("length is required when xs is None")
        self.length = int(length)
        dim = self.z_init.shape[-1]
        batch_shape = jnp.broadcast_shapes(
            self.z_init.shape[:-1],
            () if self.xs is None else self.xs.shape[:-2],
        )
        super().__init__(batch_shape, (self.length, dim))

    # -- sampling -------------------------------------------------------------
    def rsample(self, key, sample_shape=()):
        dim = self.event_shape[-1]
        shape = tuple(sample_shape) + self.batch_shape + (self.length, dim)
        eps = jax.random.normal(key, shape, self.z_init.dtype)
        eps_tm = jnp.moveaxis(eps, -2, 0)  # (T, ..., dim)
        if self.xs is None:
            xs_tm = None
        else:
            xs_b = jnp.broadcast_to(
                self.xs,
                tuple(sample_shape)
                + self.batch_shape
                + self.xs.shape[-2:],
            )
            xs_tm = jnp.moveaxis(xs_b, -2, 0)

        has_xs = xs_tm is not None

        def step(z_prev, inp):
            e_t, x_t = inp if has_xs else (inp, None)
            loc, scale = self.cond_fn(z_prev, x_t)
            z = loc + scale * e_t
            for tr in self.transforms:
                z = tr(z)
            return z, z

        z0 = jnp.broadcast_to(self.z_init, shape[:-2] + (dim,))
        _, zs = jax.lax.scan(
            step, z0, (eps_tm, xs_tm) if has_xs else eps_tm
        )
        return jnp.moveaxis(zs, 0, -2)

    def sample(self, key, sample_shape=()):
        return self.rsample(key, sample_shape)

    # -- density ---------------------------------------------------------------
    def _teacher_inputs(self, value):
        """(z_prev over all steps, base value, per-step logdet)."""
        dim = self.event_shape[-1]
        z0 = jnp.broadcast_to(
            self.z_init[..., None, :], value.shape[:-2] + (1, dim)
        )
        z_prev = jnp.concatenate([z0, value[..., :-1, :]], axis=-2)
        base = value
        logdet = jnp.zeros(value.shape[:-1], value.dtype)
        for tr in reversed(self.transforms):
            x = tr.inv(base)
            ladj = tr.log_abs_det_jacobian(x, base)
            ed = getattr(tr, "event_dim", 0)
            if ed == 0:  # elementwise: reduce over the step's dim axis
                ladj = ladj.sum(-1)
            elif ed != 1:
                raise ValueError(
                    "chain-step transforms must have event_dim <= 1"
                )
            logdet = logdet + ladj
            base = x
        return z_prev, base, logdet

    def log_prob(self, value):
        z_prev, base, logdet = self._teacher_inputs(value)
        loc, scale = self.cond_fn(z_prev, self.xs)
        lp = (
            -0.5 * jnp.square((base - loc) / scale)
            - jnp.log(scale)
            - 0.5 * math.log(2 * math.pi)
        )
        return lp.sum((-2, -1)) - logdet.sum(-1)


__all__ = ["NormalMarkovChain"]
