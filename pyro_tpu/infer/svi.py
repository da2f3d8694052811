"""Stochastic variational inference.

Ref ``pyro/infer/svi.py:16`` (``step:134``).  The reference's step is:
trace params → loss_and_grads (autograd) → per-param torch optimizers →
zero_grads.  TPU-native step: the surrogate loss is a *pure function* of the
unconstrained param pytree, compiled once with ``jax.jit`` (gradients via
``jax.value_and_grad``); the optimizer update happens inside the same XLA
program, so one SVI step is a single device launch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .. import poutine
from ..params.param_store import get_param_store
from ..poutine.messenger import Messenger


class _MissingParam(Exception):
    def __init__(self, name: str):
        super().__init__(name)
        self.name = name


class ParamsMessenger(Messenger):
    """Override param sites from a live unconstrained pytree, making model
    execution a pure function of it."""

    def __init__(self, unconstrained: Dict[str, Any], store=None):
        super().__init__()
        self.unconstrained = unconstrained
        self.store = store or get_param_store()

    def _pyro_param(self, msg):
        name = msg["name"]
        if name not in self.unconstrained:
            raise _MissingParam(name)
        constrained = self.store.constrain(name, self.unconstrained[name])
        msg["value"] = constrained
        msg["done"] = True


def _partition_args(args, kwargs):
    """Split (args, kwargs) into dynamic (traced) leaves and a hashable
    static part.  Python ints/bools/strings are treated as STATIC jit
    arguments: models routinely use them in shape positions (e.g. a
    mixture size ``k`` in ``jnp.ones(k)``), which would fail under
    tracing.  Arrays, numpy scalars and floats stay dynamic.
    """
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    static_mask = tuple(
        isinstance(leaf, (bool, int, str))
        and not isinstance(leaf, jax.Array)
        for leaf in leaves
    )
    dyn = [l for l, s in zip(leaves, static_mask) if not s]
    static = tuple(l for l, s in zip(leaves, static_mask) if s)
    return dyn, (treedef, static_mask, static)


def _merge_args(dyn, hstatic):
    treedef, static_mask, static = hstatic
    it_d, it_s = iter(dyn), iter(static)
    leaves = [next(it_s) if s else next(it_d) for s in static_mask]
    return jax.tree_util.tree_unflatten(treedef, leaves)



class SVI:
    """Ref ``svi.py:16``."""

    def __init__(
        self,
        model: Callable,
        guide: Callable,
        optim,
        loss,
        loss_and_grads=None,
        num_samples: int = 0,
        num_steps: int = 0,
        check_structure_every: int = 0,
        **kwargs,
    ):
        self.model = model
        self.guide = guide
        self.optim = optim
        self.loss_obj = loss
        self.num_samples = num_samples
        self._opt_state: Optional[Dict[str, Any]] = None
        self._update_fn = None
        self._loss_state: Dict[str, Any] = {}
        self._param_names: Optional[tuple] = None
        self._rng_key = jax.random.key(0)
        self._initialized = False
        # Models whose *param set* changes under Python-side state (e.g. a
        # new param site appears at epoch N via a non-traced branch) are
        # invisible to the cached compiled step — XLA burnt the old branch
        # in.  ``check_structure_every=k`` re-traces the loss abstractly
        # (``jax.eval_shape``: Python-trace cost, zero FLOPs — the same
        # per-step cost the reference pays for eager execution,
        # ``svi.py:134``) every k steps and lazily re-initializes when a
        # new param materializes.  0 (default) keeps the hot path
        # launch-only.
        self._check_structure_every = int(check_structure_every)
        self._step_count = 0

    def _next_key(self, rng_key=None):
        if rng_key is not None:
            return rng_key
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    # -- initialization ---------------------------------------------------------
    def _init(self, rng_key, args, kwargs) -> None:
        """Eagerly run one loss evaluation to (a) register all params in the
        store, (b) fix max_plate_nesting, (c) init optimizer state.

        The init eval runs on the HOST CPU backend when the default
        device is an accelerator: it is a one-off eager op chain, and on
        a tunneled TPU each eager op pays a device round trip (minutes
        at large model shapes).  Registered params are moved to the
        default device afterwards so the compiled step never sees
        host-committed arguments."""
        cpu = None
        if jax.default_backend() != "cpu":
            try:
                cpu = jax.devices("cpu")[0]
            except Exception:
                cpu = None

        def _to_dev(tree, device):
            return jax.tree.map(
                lambda x: jax.device_put(x, device)
                if isinstance(x, jax.Array)
                else x,
                tree,
            )

        from contextlib import nullcontext

        ctx = jax.default_device(cpu) if cpu is not None else nullcontext()
        init_args = _to_dev(args, cpu) if cpu is not None else args
        init_kwargs = _to_dev(kwargs, cpu) if cpu is not None else kwargs
        if cpu is not None:
            rng_key = jax.device_put(rng_key, cpu)
        with ctx:
            setup = getattr(self.loss_obj, "_setup", None)
            if setup is not None:
                setup(self.model, self.guide, init_args, init_kwargs)
            try:
                self.loss_obj.loss(
                    self.model,
                    self.guide,
                    *init_args,
                    rng_key=rng_key,
                    **init_kwargs,
                )
            except (ValueError, NotImplementedError):
                # losses without a unit .loss (e.g. EnergyDistance)
                self.loss_obj.differentiable_loss(
                    self.model,
                    self.guide,
                    *init_args,
                    rng_key=rng_key,
                    **init_kwargs,
                )
        store = get_param_store()
        if cpu is not None:
            # device_put WITHOUT an explicit device: the array lands on
            # the default device but stays UNCOMMITTED.  Committed params
            # force jit onto a slow dispatch path under the tunneled TPU
            # plugin (measured 25x slower per SVI step).
            store._params = {
                name: jax.device_put(value)
                for name, value in store._params.items()
            }
        params = store.get_all_unconstrained()
        if self._opt_state is None:
            self._opt_state = self.optim.init(params)
        else:
            for name, value in params.items():
                if name not in self._opt_state:
                    self._opt_state[name] = self.optim._resolve(name).init(
                        value
                    )
        self._param_names = tuple(sorted(params))
        # concrete auxiliary loss state discovered by the init eval
        # (e.g. TraceGraph decaying-average baselines), carried through
        # the jitted step; keep any state already accumulated
        if hasattr(self.loss_obj, "pop_loss_state"):
            discovered = {
                k: jax.device_put(v)
                for k, v in self.loss_obj.pop_loss_state().items()
            }
            discovered.update(getattr(self, "_loss_state", None) or {})
            self._loss_state = discovered
        else:
            self._loss_state = {}
        self._build_update_fn()
        self._initialized = True

    def _build_update_fn(self) -> None:
        store = get_param_store()
        model, guide, elbo, optim = (
            self.model,
            self.guide,
            self.loss_obj,
            self.optim,
        )

        # losses with auxiliary functional state (TraceGraph's decaying-
        # average baselines) thread it through the jitted update as an
        # extra carry; stateless losses carry an empty dict
        stateful = hasattr(elbo, "pop_loss_state")

        def loss_fn(unconstrained, rng_key, loss_state, dyn, hstatic):
            args, kwargs = _merge_args(dyn, hstatic)
            state_kw = {"loss_state": loss_state} if stateful else {}
            with ParamsMessenger(unconstrained, store):
                loss = elbo.differentiable_loss(
                    model, guide, *args, rng_key=rng_key, **kwargs, **state_kw
                )
            new_state = elbo.pop_loss_state() if stateful else loss_state
            return loss, new_state

        def update(params, opt_state, loss_state, rng_key, dyn, hstatic):
            (loss_val, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, rng_key, loss_state, dyn, hstatic)
            new_params, new_opt_state = optim.update(grads, opt_state, params)
            return loss_val, new_params, new_opt_state, new_state

        self._update_fn = jax.jit(update, static_argnums=(5,))
        self._loss_fn = jax.jit(loss_fn, static_argnums=(4,))
        self._loss_fn_raw = loss_fn  # unjitted, for abstract structure checks
        self._scan_fn = None  # invalidate run_steps cache (closes over update)

    # -- public API ---------------------------------------------------------------
    def step(self, *args, rng_key=None, **kwargs) -> float:
        """One optimization step; returns the loss estimate as a float
        (ref ``svi.py:134``)."""
        key = self._next_key(rng_key)
        store = get_param_store()
        if not self._initialized:
            self._init(key, args, kwargs)
        params = store.get_all_unconstrained()
        if tuple(sorted(params)) != self._param_names:
            # params appeared/disappeared since compile: re-init lazily
            self._init(key, args, kwargs)
            params = store.get_all_unconstrained()
        dyn, hstatic = _partition_args(args, kwargs)
        self._step_count += 1
        if self._check_structure_every and (
            self._step_count % self._check_structure_every == 0
        ):
            try:
                jax.eval_shape(
                    lambda p, k, d: self._loss_fn_raw(
                        p, k, self._loss_state, d, hstatic
                    ),
                    params,
                    key,
                    dyn,
                )
            except _MissingParam:
                self._init(key, args, kwargs)
                params = store.get_all_unconstrained()
        try:
            loss_val, new_params, self._opt_state, self._loss_state = (
                self._update_fn(
                    params, self._opt_state, self._loss_state, key, dyn, hstatic
                )
            )
        except _MissingParam:
            # a param site materialized only under this step's control flow
            self._init(key, args, kwargs)
            params = store.get_all_unconstrained()
            loss_val, new_params, self._opt_state, self._loss_state = (
                self._update_fn(
                    params, self._opt_state, self._loss_state, key, dyn, hstatic
                )
            )
        store.set_all_unconstrained(new_params)
        return float(jax.device_get(loss_val))

    def run_steps(self, num_steps: int, *args, rng_key=None, **kwargs):
        """Run ``num_steps`` optimization steps as ONE compiled program
        (``lax.scan`` over the update), returning the per-step losses.

        TPU-native addition: a Python ``step`` loop pays one host↔device
        round trip per step; this amortizes dispatch to a single launch —
        the intended hot path for production training."""
        key = self._next_key(rng_key)
        store = get_param_store()
        if not self._initialized:
            self._init(key, args, kwargs)
        params = store.get_all_unconstrained()
        if tuple(sorted(params)) != self._param_names:
            self._init(key, args, kwargs)
            params = store.get_all_unconstrained()
        update = self._update_fn

        # The jitted scan is built ONCE and cached on the instance: the
        # step count enters only through the shape of `keys`, so repeated
        # run_steps calls (any length) hit jax's jit cache instead of
        # re-tracing a fresh closure — re-tracing cost seconds per call
        # through the device tunnel.
        if getattr(self, "_scan_fn", None) is None:

            @functools.partial(jax.jit, static_argnums=(5,))
            def scan_fn(params, opt_state, loss_state, keys, dyn, hstatic):
                def body(carry, k):
                    params, opt_state, loss_state = carry
                    loss, params, opt_state, loss_state = update(
                        params, opt_state, loss_state, k, dyn, hstatic
                    )
                    return (params, opt_state, loss_state), loss

                (params, opt_state, loss_state), losses = jax.lax.scan(
                    body, (params, opt_state, loss_state), keys
                )
                return params, opt_state, loss_state, losses

            self._scan_fn = scan_fn

        keys = jax.random.split(key, num_steps)
        dyn, hstatic = _partition_args(args, kwargs)
        try:
            new_params, self._opt_state, self._loss_state, losses = (
                self._scan_fn(
                    params, self._opt_state, self._loss_state, keys, dyn, hstatic
                )
            )
        except _MissingParam:
            self._init(key, args, kwargs)
            params = store.get_all_unconstrained()
            new_params, self._opt_state, self._loss_state, losses = (
                self._scan_fn(
                    params, self._opt_state, self._loss_state, keys, dyn, hstatic
                )
            )
        store.set_all_unconstrained(new_params)
        return jax.device_get(losses)

    def evaluate_loss(self, *args, rng_key=None, **kwargs) -> float:
        """Loss without an optimization step (ref ``svi.py:108``)."""
        key = self._next_key(rng_key)
        store = get_param_store()
        if not self._initialized:
            self._init(key, args, kwargs)
        params = store.get_all_unconstrained()
        dyn, hstatic = _partition_args(args, kwargs)
        try:
            loss_val, _ = self._loss_fn(
                params, key, self._loss_state, dyn, hstatic
            )
        except _MissingParam:
            self._init(key, args, kwargs)
            params = store.get_all_unconstrained()
            loss_val, _ = self._loss_fn(
                params, key, self._loss_state, dyn, hstatic
            )
        return float(jax.device_get(loss_val))

    def run(self, *args, num_steps=None, **kwargs):
        """Convenience loop (deprecated in the reference, ``svi.py:84``)."""
        num_steps = num_steps or 1000
        losses = []
        for _ in range(num_steps):
            losses.append(self.step(*args, **kwargs))
        return losses
