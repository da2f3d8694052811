"""Schedulers, DCTAdam, and multi-optimizers.

Ref ``pyro/optim/lr_scheduler.py:12`` (PyroLRScheduler),
``pyro/optim/dct_adam.py`` (subsample-aware frequency-domain Adam used by
forecasting), ``pyro/optim/multi.py:15-168`` (MultiOptimizer,
PyroMultiOptimizer, MixedMultiOptimizer, Newton).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.tensor_utils import dct, idct
from .optim import PyroOptim


# -- schedulers -----------------------------------------------------------------


def _scheduled(base_constructor, schedule_fn):
    def ctor(**args):
        lr = args.pop("lr", 1e-3)
        sched = schedule_fn(lr, args)
        sched_args = {
            k: v
            for k, v in args.items()
            if k in ("betas", "eps", "weight_decay")
        }
        return base_constructor(learning_rate=sched, **sched_args)

    return ctor


class PyroLRScheduler(PyroOptim):
    """Wrap an optax schedule (ref ``lr_scheduler.py:12``): construct with
    a schedule factory ``lambda lr_args: optax schedule``."""

    def __init__(self, scheduler_constructor, optim_args, clip_args=None):
        super().__init__(scheduler_constructor, optim_args, clip_args)

    def step(self, *args, **kwargs):
        pass  # optax schedules advance with the step count automatically


def ExponentialLR(optim_args=None, **kwargs):
    """Adam with exponential lr decay (torch ExponentialLR parity)."""
    args = dict(optim_args or kwargs)
    gamma = args.pop("gamma", 0.99)
    base_lr = args.pop("lr", 1e-3)

    def ctor(**a):
        sched = optax.exponential_decay(
            base_lr, transition_steps=1, decay_rate=gamma
        )
        return optax.adam(sched)

    return PyroOptim(ctor, args)


def StepLR(optim_args=None, **kwargs):
    args = dict(optim_args or kwargs)
    step_size = args.pop("step_size", 100)
    gamma = args.pop("gamma", 0.1)
    base_lr = args.pop("lr", 1e-3)

    def ctor(**a):
        sched = optax.exponential_decay(
            base_lr,
            transition_steps=step_size,
            decay_rate=gamma,
            staircase=True,
        )
        return optax.adam(sched)

    return PyroOptim(ctor, args)


def MultiStepLR(optim_args=None, **kwargs):
    """Adam whose lr drops by ``gamma`` at each step in ``milestones``
    (torch MultiStepLR parity, ref ``optim/lr_scheduler.py:12``).

    Milestones count optimizer steps; the reference's per-epoch
    ``scheduler.step()`` convention maps to passing milestones already
    multiplied by steps-per-epoch.
    """
    args = dict(optim_args or kwargs)
    # reference passes {"optimizer": Adam, "optim_args": {...}} — accept
    # and flatten that layout too.
    args.pop("optimizer", None)
    inner = args.pop("optim_args", None)
    if inner:
        args.update(inner)
    milestones = list(args.pop("milestones", []))
    gamma = args.pop("gamma", 0.1)
    base_lr = args.pop("lr", 1e-3)

    def ctor(**a):
        boundaries = {int(m): gamma for m in milestones}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
        return optax.adam(sched)

    return PyroOptim(ctor, args)


def CosineAnnealingLR(optim_args=None, **kwargs):
    args = dict(optim_args or kwargs)
    T_max = args.pop("T_max", 1000)
    base_lr = args.pop("lr", 1e-3)

    def ctor(**a):
        sched = optax.cosine_decay_schedule(base_lr, decay_steps=T_max)
        return optax.adam(sched)

    return PyroOptim(ctor, args)


# -- DCTAdam --------------------------------------------------------------------


def _dct_adam_tx(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, subsample_aware=False):
    """Adam in the DCT frequency domain along the rightmost dim
    (ref ``dct_adam.py``): gradients are DCT'd, moments kept in frequency
    space, updates inverse-DCT'd back."""
    b1, b2 = betas
    adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def _dct(x):
        return dct(x) if jnp.ndim(x) >= 1 and x.shape[-1] > 1 else x

    def _idct(x):
        return idct(x) if jnp.ndim(x) >= 1 and x.shape[-1] > 1 else x

    def init_fn(params):
        freq = jax.tree.map(_dct, params)
        return adam.init(freq)

    def update_fn(updates, state, params=None):
        # dct -> adam moments in frequency space -> idct -> lr scale
        freq_updates = jax.tree.map(_dct, updates)
        scaled, state = adam.update(freq_updates, state, params)
        out = jax.tree.map(_idct, scaled)
        # descend: optax convention adds updates to params
        return jax.tree.map(lambda g: -lr * g, out), state

    return optax.GradientTransformation(init_fn, update_fn)


def DCTAdam(optim_args=None, clip_args=None, **kwargs):
    args = dict(optim_args or kwargs)
    return PyroOptim(_dct_adam_tx, args, clip_args)


# -- multi-optimizers ---------------------------------------------------------------


class MultiOptimizer:
    """Base for optimizers over named param dicts (ref ``multi.py:15``):
    ``step(loss_fn, params) -> new_params``."""

    def step(self, loss_fn: Callable, params: Dict):
        grads = jax.grad(loss_fn)(params)
        return self.get_step(grads, params)

    def get_step(self, grads: Dict, params: Dict) -> Dict:
        raise NotImplementedError


class PyroMultiOptimizer(MultiOptimizer):
    """Wrap a PyroOptim (ref ``multi.py:64``)."""

    def __init__(self, optim: PyroOptim):
        self.optim = optim

    def get_step(self, grads, params):
        return self.optim(params, grads)


class TorchMultiOptimizer(PyroMultiOptimizer):
    """Alias for API parity (ref ``multi.py:92``)."""


class Newton(MultiOptimizer):
    """Per-site batched Newton steps for rightmost-dim <= 3 latents
    (ref ``multi.py:100``)."""

    def __init__(self, trust_radii: Optional[Dict[str, float]] = None):
        self.trust_radii = dict(trust_radii or {})

    def step(self, loss_fn, params):
        from ..ops.newton import newton_step

        new_params = {}
        for name, value in params.items():
            radius = self.trust_radii.get(name)

            def site_loss(v):
                p = dict(params)
                p[name] = v
                return loss_fn(p)

            new_value, _ = newton_step(site_loss, value, radius)
            new_params[name] = new_value
        return new_params


class MixedMultiOptimizer(MultiOptimizer):
    """Different optimizers for disjoint site groups (ref ``multi.py:137``)."""

    def __init__(self, parts):
        seen = set()
        for names, _ in parts:
            for n in names:
                if n in seen:
                    raise ValueError(f"duplicate site '{n}'")
                seen.add(n)
        self.parts = parts

    def step(self, loss_fn, params):
        new_params = dict(params)
        for names, optim in self.parts:
            sub = {n: params[n] for n in names if n in params}

            def sub_loss(subp):
                full = dict(params)
                full.update(subp)
                return loss_fn(full)

            updated = optim.step(sub_loss, sub)
            new_params.update(updated)
        return new_params
