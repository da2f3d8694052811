"""Structured autoguide with learned inter-site linear dependencies.

Ref ``pyro/infer/autoguide/structured.py:30`` (AutoStructured) and
``gaussian.py:53`` (AutoGaussian).  Each latent site gets a conditional
("delta" or "normal") in unconstrained space whose location is shifted by
learned linear maps from upstream latents, with the dependency structure
taken from the model's posterior dependencies (via
``infer.inspect.get_dependencies``) or supplied explicitly.
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ...distributions import constraints
from ...distributions.continuous import Normal
from ...distributions.delta import Delta
from ...distributions.distribution import TransformedDistribution
from ...distributions.transforms import IdentityTransform, biject_to
from ...primitives import param as pyro_param
from ...primitives import sample as pyro_sample
from .guides import AutoGuide, _is_latent
from .initialization import init_to_feasible, init_to_median


class AutoStructured(AutoGuide):
    """Ref ``structured.py:30``.

    :param conditionals: dict site -> "delta"|"normal" (default "normal").
    :param dependencies: "linear" (auto-discover via posterior deps) or a
        dict downstream -> {upstream: "linear"}.
    """

    def __init__(
        self,
        model,
        *,
        conditionals: Union[str, Dict[str, str]] = "normal",
        dependencies: Union[str, Dict[str, Dict[str, str]]] = "linear",
        init_loc_fn=init_to_median,
        init_scale: float = 0.1,
    ):
        super().__init__(model)
        self.conditionals = conditionals
        self.dependencies = dependencies
        self.init_loc_fn = init_loc_fn
        self._init_scale = init_scale

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        self._transforms = {}
        self._unconstrained_shapes = {}
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            t = biject_to(site["fn"].support)
            self._transforms[name] = t
            self._unconstrained_shapes[name] = jnp.shape(
                t.inv(site["value"])
            )
        if isinstance(self.dependencies, str):
            from ... import poutine as _poutine
            from ..inspect import get_dependencies

            with _poutine.block():
                deps = get_dependencies(
                    self.model, self._proto_args, self._proto_kwargs
                )["posterior_dependencies"]
            # posterior edges with PRIOR (model) ordering, so each site's
            # conditional shifts only from already-sampled upstreams
            # (ref structured.py:149-162)
            prior_order = {
                name: i for i, name in enumerate(self._transforms)
            }
            self._deps = {d: [] for d in self._transforms}
            for d, ups in deps.items():
                if d not in self._transforms:
                    continue
                for u in ups:
                    if u == d or u not in self._transforms:
                        continue
                    late, early = (
                        (u, d) if prior_order[u] > prior_order[d] else (d, u)
                    )
                    if early not in self._deps[late]:
                        self._deps[late].append(early)
        else:
            self._deps = {
                d: list(ups) for d, ups in self.dependencies.items()
            }

    def __call__(self, *args, **kwargs):
        from contextlib import ExitStack

        if self.prototype_trace is None:
            self._proto_args, self._proto_kwargs = args, kwargs
            self._setup_prototype(*args, **kwargs)
        plates = self._create_plates(*args, **kwargs)
        values_unconstrained: "OrderedDict" = OrderedDict()
        result = {}
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            t = self._transforms[name]
            shape = self._unconstrained_shapes[name]
            # host math: shapes are static tuples, and a staged
            # jnp.prod is a tracer under jit (int() would raise)
            size = math.prod(shape) if shape else 1
            init = t.inv(self.init_loc_fn(site))
            loc = pyro_param(f"{self._name}.locs.{name}", init)
            # linear shifts from sampled upstream latents (batch dims, e.g.
            # vectorized particles, are preserved on the left)
            shift = 0.0
            for up in self._deps.get(name, []):
                if up not in values_unconstrained:
                    continue
                u_val = values_unconstrained[up]
                ushape = self._unconstrained_shapes[up]
                u_size = max(math.prod(ushape) if ushape else 1, 1)
                W = pyro_param(
                    f"{self._name}.deps.{name}.{up}",
                    jnp.zeros((u_size, size)),
                )
                batch_ndim = jnp.ndim(u_val) - len(ushape)
                u2 = u_val.reshape(
                    jnp.shape(u_val)[:batch_ndim] + (u_size,)
                )
                s = u2 @ W
                shift = shift + s.reshape(
                    jnp.shape(u_val)[:batch_ndim] + shape
                )
            cond = (
                self.conditionals
                if isinstance(self.conditionals, str)
                else self.conditionals.get(name, "normal")
            )
            # re-enter the model's plates for this site: its plate dims
            # stay BATCH dims (only true event dims are to_event-ed), so
            # an outer vectorized-particles plate broadcasts at its own
            # dim instead of into the site's plates (a 100-particle guide
            # previously produced 100x-overcounted model traces)
            frames = self._prototype_frames.get(name, ())
            with ExitStack() as stack:
                for f in frames:
                    if f.name in plates:
                        stack.enter_context(plates[f.name])
                if cond == "delta":
                    value_u = loc + shift
                    value = t(value_u)
                    ld = t.log_abs_det_jacobian(value_u, value)
                    event_dim = site["fn"].event_dim
                    extra = jnp.ndim(ld) - (jnp.ndim(value) - event_dim)
                    if extra > 0:
                        ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
                    result[name] = pyro_sample(
                        name,
                        Delta(value, log_density=-ld, event_dim=event_dim),
                    )
                    values_unconstrained[name] = value_u
                else:
                    scale = pyro_param(
                        f"{self._name}.scales.{name}",
                        jnp.full(shape, self._init_scale),
                        constraint=constraints.softplus_positive,
                    )
                    base = Normal(loc + shift, scale).to_event(
                        t.domain.event_dim
                    )
                    fn = (
                        base
                        if isinstance(t, IdentityTransform)
                        else TransformedDistribution(base, t)
                    )
                    value = pyro_sample(name, fn)
                    values_unconstrained[name] = t.inv(value)
                    result[name] = value
        return result

    def median(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._proto_args, self._proto_kwargs = args, kwargs
            self._setup_prototype(*args, **kwargs)
        from ...params.param_store import get_param_store

        store = get_param_store()
        out = {}
        values = {}
        for name in self._transforms:
            loc = store[f"{self._name}.locs.{name}"]
            shift = jnp.zeros_like(loc)
            for up in self._deps.get(name, []):
                key = f"{self._name}.deps.{name}.{up}"
                if up in values and key in store:
                    W = store[key]
                    shift = shift + (
                        values[up].reshape(-1) @ W
                    ).reshape(jnp.shape(loc))
            values[name] = loc + shift
            out[name] = self._transforms[name](values[name])
        return out


class AutoGaussian(AutoStructured):
    """Joint-Gaussian structured guide (ref ``gaussian.py:53``): alias of
    AutoStructured with normal conditionals + linear dependencies, which
    parameterizes the same sparse-precision Gaussian family."""

    def __init__(self, model, *, init_loc_fn=init_to_median, init_scale=0.1, backend="dense"):
        super().__init__(
            model,
            conditionals="normal",
            dependencies="linear",
            init_loc_fn=init_loc_fn,
            init_scale=init_scale,
        )


class AutoGaussianDense(AutoGaussian):
    """Dense backend of AutoGaussian (ref ``gaussian.py:311``): in this
    framework AutoGaussian's linear-dependency conditionals already
    materialize as dense per-edge weight matrices in one XLA program, so
    the dense backend is the default implementation."""


class AutoGaussianFunsor(AutoGaussian):
    """Funsor backend name (ref ``gaussian.py:444``).  The funsor message
    passing it implements is served natively by the contraction engine
    (``ops/contract.py``); this alias exists for API parity."""
