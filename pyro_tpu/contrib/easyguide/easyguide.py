"""EasyGuide: group sites and guide them jointly.

Ref ``pyro/contrib/easyguide/easyguide.py:26`` (EasyGuide), ``:177``
(Group).  A user subclasses :class:`EasyGuide` (or decorates a function
with :func:`easy_guide`), calls ``self.group(match=...)`` to bundle latent
sites, and either ``group.sample(...)`` a joint MVN over the bundle or
``self.map_estimate(name)`` single sites.
"""

from __future__ import annotations

import functools
import re
from typing import Callable, Dict, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from ... import poutine
from ...distributions import constraints
from ...distributions.continuous import Normal
from ...distributions.delta import Delta
from ...distributions.distribution import TransformedDistribution
from ...distributions.multivariate import MultivariateNormal
from ...distributions.transforms import biject_to
from ...infer.autoguide.initialization import init_to_median
from ...poutine.util import prune_subsample_sites, site_is_subsample
from ...primitives import param as pyro_param
from ...primitives import sample as pyro_sample


class EasyGuide:
    """Ref ``easyguide.py:26``."""

    def __init__(self, model):
        self.model = model
        self.prototype_trace = None
        self.groups: Dict[str, "Group"] = {}
        self._name = type(self).__name__

    def _setup_prototype(self, *args, **kwargs):
        with poutine.block():
            trace = poutine.trace(
                poutine.seed(self.model, rng_key=jax.random.key(0))
            ).get_trace(*args, **kwargs)
        self.prototype_trace = prune_subsample_sites(trace)
        self.frames = {}
        for name, site in self.prototype_trace.nodes.items():
            if site["type"] == "sample" and not site["is_observed"]:
                for frame in site["cond_indep_stack"]:
                    if frame.dim is not None:
                        self.frames[frame.name] = frame

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        result = self.guide(*args, **kwargs)
        return result if result is not None else {}

    def guide(self, *args, **kwargs):
        raise NotImplementedError

    def plate(self, name, size=None, subsample_size=None, subsample=None, **kwargs):
        from ...primitives import plate as pyro_plate

        return pyro_plate(
            name, size, subsample_size=subsample_size, subsample=subsample
        )

    def group(self, match: str = ".*") -> "Group":
        if match not in self.groups:
            pattern = re.compile(match)
            sites = [
                site
                for name, site in self.prototype_trace.nodes.items()
                if site["type"] == "sample"
                and not site["is_observed"]
                and pattern.match(name)
            ]
            if not sites:
                raise ValueError(f"EasyGuide.group() found no sites matching: {match}")
            self.groups[match] = Group(self, sites)
        return self.groups[match]

    def map_estimate(self, name: str):
        """Delta guide for one site (ref ``easyguide.py:145``)."""
        site = self.prototype_trace.nodes[name]
        fn = site["fn"]
        init = init_to_median(site)
        value = pyro_param(
            f"{self._name}.{name}", init, constraint=fn.support,
            event_dim=fn.event_dim,
        )
        return pyro_sample(name, Delta(value, event_dim=fn.event_dim))


class Group:
    """Joint MVN over a group of sites (ref ``easyguide.py:177``)."""

    def __init__(self, guide: EasyGuide, sites):
        self.guide = guide
        self.prototype_sites = sites
        self._transforms = {}
        init = {}
        for site in sites:
            t = biject_to(site["fn"].support)
            self._transforms[site["name"]] = t
            init[site["name"]] = t.inv(site["value"])
        flat, self._unravel = jax.flatten_util.ravel_pytree(init)
        self.event_shape = (flat.shape[0],)

    def sample(self, guide_name: str, fn, infer=None):
        """Sample a packed latent for the whole group and unpack to sites.

        ``fn`` is a distribution over ``self.event_shape`` (e.g. from
        ``group.event_shape``)."""
        latent = pyro_sample(
            guide_name, fn, infer={**(infer or {}), "is_auxiliary": True}
        )
        unravel = self._unravel
        batch_shape = latent.shape[:-1]
        if batch_shape:
            flat = latent.reshape((-1, latent.shape[-1]))
            un = jax.vmap(unravel)(flat)
            un = {
                k: v.reshape(batch_shape + v.shape[1:])
                for k, v in un.items()
            }
        else:
            un = unravel(latent)
        values = {}
        for site in self.prototype_sites:
            name = site["name"]
            t = self._transforms[name]
            u = un[name]
            value = t(u)
            ld = t.log_abs_det_jacobian(u, value)
            event_dim = site["fn"].event_dim
            extra = jnp.ndim(ld) - (jnp.ndim(value) - event_dim)
            if extra > 0:
                ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
            values[name] = pyro_sample(
                name, Delta(value, log_density=-ld, event_dim=event_dim)
            )
        return latent, values

    def map_estimate(self):
        """Delta guides for each site in the group."""
        return {
            site["name"]: self.guide.map_estimate(site["name"])
            for site in self.prototype_sites
        }


def easy_guide(model):
    """Decorator turning ``fn(self, *args)`` into an EasyGuide instance
    (ref ``easyguide.py:easy_guide``)."""

    def decorator(fn):
        Guide = type(fn.__name__, (EasyGuide,), {"guide": fn})
        return Guide(model)

    return decorator
