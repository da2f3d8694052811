"""Optimizers over dynamically-created parameters.

Ref ``pyro/optim/optim.py:72`` (PyroOptim): the reference lazily creates one
torch optimizer *per parameter* so params may appear at any step, with
per-param hyperparameters from a callable ``optim_args(module, name)``.

TPU-native design: params live in a name→array pytree; a ``PyroOptim``
groups names by their resolved hyperparameter dict and applies one optax
``GradientTransformation`` per group.  Group membership is static per name,
so a step is a pure jittable function of (params, grads, opt_state); when a
new param appears between steps the state is re-initialized for it only
(deferred init, mirroring the reference's laziness).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax

from ..params.param_store import module_from_param_with_module_name, user_param_name


class PyroOptim:
    """Wrap an optax-constructor with per-param-group hyperparameters."""

    def __init__(
        self,
        optim_constructor: Callable[..., optax.GradientTransformation],
        optim_args: Union[Dict, Callable],
        clip_args: Optional[Union[Dict, Callable]] = None,
    ):
        self.pt_optim_constructor = optim_constructor
        if not callable(optim_args):
            static_args = dict(optim_args)
            optim_args = lambda module_name, param_name: static_args
        self.pt_optim_args = optim_args
        if clip_args is not None and not callable(clip_args):
            static_clip = dict(clip_args)
            clip_args = lambda module_name, param_name: static_clip
        self.pt_clip_args = clip_args
        # name -> (argkey, transform); argkey -> transform
        self._transforms: Dict[Any, optax.GradientTransformation] = {}
        self._name_to_argkey: Dict[str, Any] = {}
        self._states: Dict[str, Any] = {}  # per-param optax state

    # -- group resolution ---------------------------------------------------
    def _resolve(self, name: str) -> optax.GradientTransformation:
        if name in self._name_to_argkey:
            return self._transforms[self._name_to_argkey[name]]
        module_name = module_from_param_with_module_name(name)
        param_name = user_param_name(name)
        args = dict(self.pt_optim_args(module_name, param_name))
        clip = (
            dict(self.pt_clip_args(module_name, param_name))
            if self.pt_clip_args is not None
            else None
        )
        argkey = (tuple(sorted(args.items())), tuple(sorted(clip.items())) if clip else None)
        if argkey not in self._transforms:
            tx = self.pt_optim_constructor(**args)
            if clip:
                parts = []
                if "clip_norm" in clip:
                    parts.append(optax.clip_by_global_norm(clip["clip_norm"]))
                if "clip_value" in clip:
                    parts.append(optax.clip(clip["clip_value"]))
                tx = optax.chain(*parts, tx)
            self._transforms[argkey] = tx
        self._name_to_argkey[name] = argkey
        return self._transforms[argkey]

    # -- functional API (used by SVI under jit) ---------------------------------
    def init(self, params: Dict[str, jax.Array]) -> Dict[str, Any]:
        """Initialize (or extend) per-param optimizer state."""
        states = {}
        for name, value in params.items():
            tx = self._resolve(name)
            states[name] = tx.init(value)
        self._states = states
        return states

    def update(
        self,
        grads: Dict[str, jax.Array],
        states: Dict[str, Any],
        params: Dict[str, jax.Array],
    ) -> Tuple[Dict[str, jax.Array], Dict[str, Any]]:
        """Pure update: returns (new_params, new_states)."""
        new_params, new_states = {}, {}
        for name, g in grads.items():
            tx = self._resolve(name)
            upd, new_state = tx.update(g, states[name], params[name])
            new_params[name] = optax.apply_updates(params[name], upd)
            new_states[name] = new_state
        for name in params:
            if name not in grads:
                new_params[name] = params[name]
                new_states[name] = states[name]
        return new_params, new_states

    # -- stateful convenience (ref ``optim.py:117-150``) ------------------------
    def __call__(
        self, params: Dict[str, jax.Array], grads: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        for name in params:
            if name not in self._states:
                self._states[name] = self._resolve(name).init(params[name])
        new_params, self._states = self.update(grads, self._states, params)
        return new_params

    # -- persistence (ref ``optim.py:157-240``) ----------------------------------
    def get_state(self) -> dict:
        return {
            "states": jax.device_get(self._states),
            "name_to_argkey": dict(self._name_to_argkey),
        }

    def set_state(self, state: dict) -> None:
        self._states = jax.tree.map(jnp.asarray, state["states"])
        self._name_to_argkey = dict(state["name_to_argkey"])
        for name, argkey in self._name_to_argkey.items():
            if argkey not in self._transforms:
                self._name_to_argkey.pop(name)
                self._resolve(name)

    def save(self, filename: str) -> None:
        import pickle

        with open(filename, "wb") as f:
            pickle.dump(self.get_state(), f)

    def load(self, filename: str) -> None:
        import pickle

        with open(filename, "rb") as f:
            self.set_state(pickle.load(f))


def _wrap(constructor, name):
    def factory(optim_args=None, clip_args=None, **kwargs):
        if optim_args is None:
            optim_args = kwargs
        return PyroOptim(constructor, optim_args, clip_args)

    factory.__name__ = name
    return factory


def _adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    b1, b2 = betas
    if weight_decay:
        return optax.adamw(
            lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
        )
    return optax.adam(lr, b1=b1, b2=b2, eps=eps)


def _sgd(lr=1e-3, momentum=0.0, nesterov=False, weight_decay=0.0):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def _rmsprop(lr=1e-2, alpha=0.99, eps=1e-8, momentum=0.0, centered=False):
    return optax.rmsprop(
        lr, decay=alpha, eps=eps, momentum=momentum or None, centered=centered
    )


def _adagrad(lr=1e-2, eps=1e-10):
    return optax.adagrad(lr, eps=eps)


def _clipped_adam(
    lr=1e-3, betas=(0.9, 0.999), eps=1e-8, clip_norm=10.0, lrd=1.0,
    weight_decay=0.0,
):
    """Ref ``pyro/optim/clipped_adam.py:9``: per-param gradient clipping +
    multiplicative lr decay ``lr_t = lr * lrd^t``."""
    b1, b2 = betas
    sched = (
        (lambda step: lr * lrd**step) if lrd != 1.0 else lr
    )
    parts = [optax.clip(clip_norm)]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*parts)


def _adagrad_rmsprop(eta=1.0, delta=1e-16, t=0.1):
    """Ref ``pyro/optim/adagrad_rmsprop.py:9``: mashup with tail-averaged
    adaptive step size lr_t = eta * t^(-1/2+delta) and RMSProp-style
    second-moment decay."""

    def init_fn(params):
        return {
            "step": jnp.zeros([], jnp.int32),
            "sum_sq": jax.tree.map(jnp.zeros_like, params),
        }

    def update_fn(updates, state, params=None):
        step = state["step"] + 1
        sum_sq = jax.tree.map(
            lambda s, g: s * (1.0 - t) + t * g * g, state["sum_sq"], updates
        )
        lr = eta * jnp.power(step.astype(jnp.float32), -0.5 + delta)
        new_updates = jax.tree.map(
            lambda g, s: -lr * g / (jnp.sqrt(s) + delta), updates, sum_sq
        )
        return new_updates, {"step": step, "sum_sq": sum_sq}

    return optax.GradientTransformation(init_fn, update_fn)


Adam = _wrap(_adam, "Adam")
AdamW = _wrap(
    lambda lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2: optax.adamw(
        lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    ),
    "AdamW",
)
SGD = _wrap(_sgd, "SGD")
RMSprop = _wrap(_rmsprop, "RMSprop")
Adagrad = _wrap(_adagrad, "Adagrad")
ClippedAdam = _wrap(_clipped_adam, "ClippedAdam")
AdagradRMSProp = _wrap(_adagrad_rmsprop, "AdagradRMSProp")
Adadelta = _wrap(lambda lr=1.0, rho=0.9, eps=1e-6: optax.adadelta(lr, rho=rho, eps=eps), "Adadelta")
Adamax = _wrap(lambda lr=2e-3, betas=(0.9, 0.999), eps=1e-8: optax.adamax(lr, b1=betas[0], b2=betas[1], eps=eps), "Adamax")
NAdam = _wrap(lambda lr=2e-3, betas=(0.9, 0.999), eps=1e-8: optax.nadam(lr, b1=betas[0], b2=betas[1], eps=eps), "NAdam")
RAdam = _wrap(lambda lr=1e-3, betas=(0.9, 0.999), eps=1e-8: optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps), "RAdam")


class HorovodOptimizer:
    """Distributed data-parallel optimizer wrapper.

    Ref ``pyro/optim/horovod.py:13``: the reference wraps a PyroOptim in
    ``horovod.torch.DistributedOptimizer`` (ring-allreduce gradient
    averaging).  The TPU-native equivalent is a ``lax.pmean`` of the
    gradients over a named mesh axis before the inner update — when the
    SVI step runs under ``shard_map``/``pmap`` over that axis, XLA lowers
    the pmean to an ICI all-reduce, which *is* the ring-allreduce.  Used
    standalone (no mapped axis) it degrades gracefully to the inner
    optimizer.  See also ``pyro_tpu.parallel.DataParallelSVI``, which
    wires this pattern end-to-end.

    :param pyro_optim: a :class:`PyroOptim` instance to wrap.
    :param str axis_name: the mapped mesh axis to average gradients over.
    """

    def __init__(self, pyro_optim: "PyroOptim", axis_name: str = "data", **kwargs):
        self._inner = pyro_optim
        self.axis_name = axis_name

    def _allreduce(self, grads):
        try:
            return jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, self.axis_name), grads
            )
        except NameError:  # not under a mapped axis: single-process mode
            return grads

    def init(self, params):
        return self._inner.init(params)

    def update(self, grads, states, params):
        return self._inner.update(self._allreduce(grads), states, params)

    def __call__(self, params, grads):
        return self._inner(params, self._allreduce(grads))

    def __getattr__(self, name):
        return getattr(self._inner, name)
