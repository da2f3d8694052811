"""Autoguide initialization strategies (ref
``pyro/infer/autoguide/initialization.py:35-220``)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...distributions.transforms import biject_to


def init_to_feasible(site=None):
    """Center of the unconstrained space (ref ``initialization.py:35``)."""
    if site is None:
        return init_to_feasible
    t = biject_to(site["fn"].support)
    value = site["fn"].sample(jax.random.key(0))
    return t(jnp.zeros_like(t.inv(value)))


def init_to_sample(site=None):
    """A prior sample (ref ``initialization.py:68``)."""
    if site is None:
        return init_to_sample
    return site["fn"].sample(jax.random.key(20))


def init_to_median(site=None, num_samples: int = 15):
    """Feasible median of a few prior draws (ref ``initialization.py:81``)."""
    if site is None:
        return functools.partial(init_to_median, num_samples=num_samples)
    try:
        samples = site["fn"].sample(jax.random.key(23), (num_samples,))
        return jnp.median(samples, axis=0)
    except (NotImplementedError, ValueError):
        return init_to_feasible(site)


def init_to_mean(site=None, fallback=init_to_median):
    """Prior mean (ref ``initialization.py:108``)."""
    if site is None:
        return functools.partial(init_to_mean, fallback=fallback)
    try:
        mean = site["fn"].mean
        if bool(jnp.all(jnp.isfinite(mean))):
            return mean
    except (NotImplementedError, TypeError):
        pass
    return fallback(site)


def init_to_uniform(site=None, radius: float = 2.0):
    """Uniform in unconstrained space (ref ``initialization.py:132``)."""
    if site is None:
        return functools.partial(init_to_uniform, radius=radius)
    t = biject_to(site["fn"].support)
    value = site["fn"].sample(jax.random.key(0))
    u = t.inv(value)
    noise = jax.random.uniform(
        jax.random.key(16), jnp.shape(u), minval=-radius, maxval=radius
    )
    return t(noise)


def init_to_value(site=None, values=None, fallback=init_to_uniform):
    """User-specified values with fallback (ref ``initialization.py:150``)."""
    if site is None:
        return functools.partial(
            init_to_value, values=values, fallback=fallback
        )
    values = values or {}
    if site["name"] in values:
        return jnp.asarray(values[site["name"]])
    return fallback(site)


def init_to_generated(site=None, generate=lambda: init_to_uniform):
    """Initialize via a strategy regenerated once per model execution
    (ref ``initialization.py:197``): ``generate()`` returns another init
    function (e.g. ``init_to_value`` over fresh random draws)."""
    init = _InitToGenerated(generate)
    return init if site is None else init(site)


class _InitToGenerated:
    def __init__(self, generate):
        self.generate = generate
        self._instance = None
        self._seen = set()

    def __call__(self, site):
        # regenerate when a site repeats (a new model execution started)
        if self._instance is None or site["name"] in self._seen:
            self._instance = self.generate()
            self._seen = set()
        self._seen.add(site["name"])
        return self._instance(site)
