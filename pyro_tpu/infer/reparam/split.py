"""Split one site into pieces (ref ``pyro/infer/reparam/split.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions import constraints
from ...distributions.delta import Delta, ImproperUniform
from .reparam import Reparam


def same_support(fn, *args):
    """The unsliced support of ``fn`` (ref ``split.py:same_support``)."""
    return fn.support


def real_support(fn, *args):
    """Unconstrained support with ``fn``'s event dim (ref
    ``split.py:real_support``)."""
    return constraints.independent(constraints.real, fn.event_dim)


def default_support(fn, slc, dim):
    """Support of ``fn`` corrected for the split slice (ref
    ``split.py:default_support``).  The reference additionally slices
    ``constraints.cat``/``constraints.stack``; this catalog has no cat/stack
    constraints, so the unwrapped support is returned as-is."""
    return fn.support


class SplitReparam(Reparam):
    """Split a random variable along an event dimension, so each chunk is
    its own latent site (ref ``pyro/infer/reparam/split.py:66``).

    Each piece ``{name}_split_{i}`` is drawn from an
    :class:`~pyro_tpu.distributions.ImproperUniform` (zero density —
    conditionable or guided, but not sampleable from the prior); the
    original site becomes a :class:`Delta` at the concatenation whose
    ``log_density`` carries the original joint density.
    """

    def __init__(self, sections, dim: int, support_fn=default_support):
        assert isinstance(dim, int) and dim < 0
        self.event_dim = -dim
        self.sections = list(sections)
        self.support_fn = support_fn

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        assert fn.event_dim >= self.event_dim

        # Split any incoming value into parts.
        value_split = [None] * len(self.sections)
        if value is not None:
            starts = [0]
            for size in self.sections:
                starts.append(starts[-1] + size)
            axis = jnp.ndim(value) - self.event_dim
            value_split = [
                jnp.take(value, jnp.arange(starts[i], starts[i + 1]), axis=axis)
                for i in range(len(self.sections))
            ]

        # Draw independent parts, each a real latent site.
        dim = fn.event_dim - self.event_dim
        left_shape = tuple(fn.event_shape[:dim])
        right_shape = tuple(fn.event_shape[1 + dim :])
        start = 0
        for i, size in enumerate(self.sections):
            event_shape = left_shape + (size,) + right_shape
            value_split[i] = pyro.sample(
                f"{name}_split_{i}",
                ImproperUniform(
                    self.support_fn(
                        fn, slice(start, start + size), -self.event_dim
                    ),
                    fn.batch_shape,
                    event_shape,
                ),
                obs=value_split[i],
                infer={"is_observed": is_observed},
            )
            start += size

        # Combine parts into the full value.
        if value is None:
            axis = -self.event_dim
            # broadcast every non-split dim so concatenation is legal
            shapes = [list(jnp.shape(p)) for p in value_split]
            ndim = max(len(s) for s in shapes)
            shapes = [[1] * (ndim - len(s)) + s for s in shapes]
            target = [max(s[d] for s in shapes) for d in range(ndim)]
            pieces = []
            for p in value_split:
                t = list(target)
                t[axis] = jnp.shape(p)[axis]
                pieces.append(jnp.broadcast_to(p, tuple(t)))
            value = jnp.concatenate(pieces, axis=axis)

        from ...poutine.runtime import get_mask

        if get_mask() is False:
            log_density = 0.0
        else:
            log_density = fn.log_prob(value)
        new_fn = Delta(value, event_dim=fn.event_dim, log_density=log_density)
        return {"fn": new_fn, "value": value, "is_observed": True}
