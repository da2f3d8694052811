"""Distribution base classes.

Ref ``pyro/distributions/distribution.py:29`` (``Distribution`` ABC with
``__call__``→sample, ``has_rsample``, ``enumerate_support``,
``conjugate_update``) and ``pyro/distributions/torch_distribution.py:19``
(``TorchDistributionMixin``: ``shape()``, ``expand_by``, ``to_event``,
``mask``) — here fused into one JAX-native base class.

TPU-native design decisions:

* Sampling is explicit-key: ``d.sample(key, sample_shape)`` (also accepted as
  ``d(rng_key=key, sample_shape=...)`` by the effect runtime).  Reparameterized
  distributions implement ``rsample`` and ``sample`` simply aliases it.
* Every concrete distribution is registered as a JAX pytree whose leaves are
  its array parameters, so distributions can be carried through ``lax.scan``,
  ``vmap``, and ``jit`` boundaries and stored in traces.
* Shapes follow the torch.distributions contract: ``batch_shape`` +
  ``event_shape``, with ``expand``/``to_event``/``mask`` wrappers.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constraints
from .score_parts import ScoreParts
from .util import broadcast_shape, scale_and_mask, sum_rightmost


def _is_array_leaf(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) or hasattr(x, "aval")


class DistributionMeta(type):
    """Metaclass that captures constructor args for pytree registration.

    Ref ``pyro/distributions/distribution.py:15`` (DistributionMeta).
    """

    def __call__(cls, *args, **kwargs):
        instance = super().__call__(*args, **kwargs)
        # record init args for tree_flatten; subclasses may override by
        # setting _pyro_init_args themselves.
        if not hasattr(instance, "_pyro_init_args"):
            instance._pyro_init_args = (args, tuple(sorted(kwargs.items())))
        return instance

    def __init__(cls, name, bases, namespace):
        super().__init__(name, bases, namespace)
        if not namespace.get("_abstract", False):
            _register_dist_pytree(cls)


def _dist_flatten(d):
    args, kwargs = d._pyro_init_args
    flat = list(args) + [v for _, v in kwargs]
    leaves, statics = [], []
    is_leaf = []
    for x in flat:
        if _is_array_leaf(x):
            leaves.append(x)
            is_leaf.append(True)
        else:
            statics.append(x)
            is_leaf.append(False)
    aux = (tuple(is_leaf), tuple(statics), len(args), tuple(k for k, _ in kwargs))
    return leaves, aux


def _dist_unflatten(cls, aux, leaves):
    is_leaf, statics, nargs, kw_keys = aux
    leaves = list(leaves)
    statics = list(statics)
    flat = [leaves.pop(0) if il else statics.pop(0) for il in is_leaf]
    args = flat[:nargs]
    kwargs = dict(zip(kw_keys, flat[nargs:]))
    return cls(*args, **kwargs)


def _register_dist_pytree(cls):
    try:
        jax.tree_util.register_pytree_node(
            cls, _dist_flatten, functools.partial(_dist_unflatten, cls)
        )
    except ValueError:
        pass  # already registered (e.g. class re-execution in tests)


class Distribution(metaclass=DistributionMeta):
    """Base class of all distributions (ref ``distribution.py:29``)."""

    _abstract = True

    arg_constraints: Dict[str, constraints.Constraint] = {}
    support: constraints.Constraint = constraints.real
    has_rsample = False
    has_enumerate_support = False
    is_discrete = False
    reparametrized_params: tuple = ()

    def __init__(self, batch_shape=(), event_shape=()):
        self._batch_shape = tuple(batch_shape)
        self._event_shape = tuple(event_shape)

    # -- shape contract -------------------------------------------------------
    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self._batch_shape

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return self._event_shape

    @property
    def event_dim(self) -> int:
        return len(self.event_shape)

    def shape(self, sample_shape=()) -> Tuple[int, ...]:
        """Shape of a sample: ``sample_shape + batch_shape + event_shape``
        (ref ``torch_distribution.py:81``)."""
        return tuple(sample_shape) + self.batch_shape + self.event_shape

    # -- sampling -------------------------------------------------------------
    def __call__(self, *args, rng_key=None, sample_shape=(), **kwargs):
        """Sample; used by the effect runtime (ref ``distribution.py:49``)."""
        return self.sample(rng_key, sample_shape)

    def sample(self, key, sample_shape=()):
        if self.has_rsample:
            return self.rsample(key, sample_shape)
        # a subclass may declare has_rsample = False on a distribution that
        # implements rsample (e.g. testing.fakes force the score-function
        # path): sample via rsample with gradients detached, like torch
        try:
            return jax.lax.stop_gradient(self.rsample(key, sample_shape))
        except NotImplementedError:
            raise NotImplementedError(
                f"{type(self).__name__}.sample is not implemented"
            )

    def rsample(self, key, sample_shape=()):
        raise NotImplementedError(
            f"{type(self).__name__} is not reparameterizable"
        )

    def log_prob(self, value):
        raise NotImplementedError

    def sample_with_intermediates(self, key, sample_shape=()):
        return self.sample(key, sample_shape), None

    def score_parts(self, value, *args, **kwargs) -> ScoreParts:
        """Surrogate-gradient decomposition (ref ``distribution.py:110``)."""
        log_prob = self.log_prob(value, *args, **kwargs)
        if self.has_rsample:
            return ScoreParts(log_prob, 0, log_prob)
        # non-reparameterized: score-function estimator.  The value must be
        # detached from the params; gradients flow through score_function.
        return ScoreParts(log_prob, log_prob, 0)

    # -- stats ---------------------------------------------------------------
    @property
    def mean(self):
        raise NotImplementedError

    @property
    def variance(self):
        raise NotImplementedError

    @property
    def stddev(self):
        return jnp.sqrt(self.variance)

    def entropy(self):
        raise NotImplementedError

    def cdf(self, value):
        raise NotImplementedError

    def icdf(self, value):
        raise NotImplementedError

    # -- structure ------------------------------------------------------------
    def expand(self, batch_shape, _instance=None) -> "Distribution":
        """Expand batch_shape by broadcasting params.

        Default implementation wraps in ``ExpandedDistribution``
        (ref ``torch_distribution.py:399``); concrete classes with simple
        parameterizations override via ``_broadcast_params``.
        """
        batch_shape = tuple(batch_shape)
        if batch_shape == self.batch_shape:
            return self
        return ExpandedDistribution(self, batch_shape)

    def expand_by(self, sample_shape) -> "Distribution":
        """Prepend dims to batch_shape (ref ``torch_distribution.py:120``)."""
        if not sample_shape:
            return self
        return self.expand(tuple(sample_shape) + self.batch_shape)

    def to_event(self, reinterpreted_batch_ndims: Optional[int] = None):
        """Reinterpret rightmost batch dims as event dims
        (ref ``torch_distribution.py:142``)."""
        if reinterpreted_batch_ndims is None:
            reinterpreted_batch_ndims = len(self.batch_shape)
        if reinterpreted_batch_ndims == 0:
            return self
        return Independent(self, reinterpreted_batch_ndims)

    def mask(self, mask) -> "Distribution":
        """Mask out log_prob elementwise (ref ``torch_distribution.py:203``)."""
        if mask is True:
            return self
        return MaskedDistribution(self, mask)

    def independent(self, reinterpreted_batch_ndims=None):
        return self.to_event(reinterpreted_batch_ndims)

    @property
    def mode(self):
        """Mode of the distribution (torch ``Distribution.mode`` parity:
        concrete families override; the base raises)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement mode"
        )

    def perplexity(self):
        """exp(entropy), batched over batch_shape (torch parity)."""
        import jax.numpy as jnp

        return jnp.exp(self.entropy())

    def reshape(self, sample_shape=None, extra_event_dims=None):
        # ref torch_distribution.py:156: the old .reshape API was renamed
        raise Exception(
            ".reshape(sample_shape=s, extra_event_dims=n) was renamed and "
            "split into .expand_by(sample_shape=s)"
            ".to_event(reinterpreted_batch_ndims=n)."
        )

    @classmethod
    def infer_shapes(cls, **arg_shapes):
        """Infer ``(batch_shape, event_shape)`` from the shapes of
        ``__init__`` args (ref ``torch_distribution.py:94-123``; assumes
        shape depends only on arg shapes).  Univariate only."""
        from .util import broadcast_shape

        support = cls.support
        event_dim = getattr(support, "event_dim", 0)
        if callable(support) and not hasattr(support, "event_dim"):
            event_dim = 0
        if event_dim and event_dim > 0:
            raise NotImplementedError
        batch_shapes = []
        for name, shape in arg_shapes.items():
            constraint = cls.arg_constraints.get(name, None)
            arg_event_dim = getattr(constraint, "event_dim", 0) or 0
            batch_shapes.append(shape[: len(shape) - arg_event_dim])
        batch_shape = broadcast_shape(*batch_shapes) if batch_shapes else ()
        return tuple(batch_shape), ()

    # -- inference hooks --------------------------------------------------------
    def enumerate_support(self, expand: bool = True):
        raise NotImplementedError(
            f"{type(self).__name__} has no enumerate_support"
        )

    def conjugate_update(self, other):
        """Ref ``distribution.py:150``: EXPERIMENTAL fuse with a compatible
        likelihood, returning (updated, log_normalizer)."""
        raise NotImplementedError

    def has_rsample_(self, value: bool):
        self.has_rsample = value
        return self

    @property
    def rv(self):
        from ..contrib.randomvariable import RandomVariable

        return RandomVariable(self)

    def __repr__(self) -> str:
        return f"{type(self).__name__}(batch_shape={self.batch_shape}, event_shape={self.event_shape})"


class Independent(Distribution):
    """Reinterpret rightmost batch dims as event dims (torch.Independent)."""

    arg_constraints: Dict[str, constraints.Constraint] = {}

    def __init__(self, base_dist: Distribution, reinterpreted_batch_ndims: int):
        if reinterpreted_batch_ndims > len(base_dist.batch_shape):
            raise ValueError(
                f"cannot reinterpret {reinterpreted_batch_ndims} dims of "
                f"batch_shape {base_dist.batch_shape}"
            )
        self.base_dist = base_dist
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims
        shape = base_dist.batch_shape + base_dist.event_shape
        event_ndim = len(base_dist.event_shape) + reinterpreted_batch_ndims
        super().__init__(shape[: len(shape) - event_ndim], shape[len(shape) - event_ndim:])

    @property
    def has_rsample(self):  # type: ignore[override]
        return self.base_dist.has_rsample

    @property
    def has_enumerate_support(self):  # type: ignore[override]
        return False

    @property
    def support(self):  # type: ignore[override]
        base = self.base_dist.support
        if self.reinterpreted_batch_ndims:
            return constraints.independent(base, self.reinterpreted_batch_ndims)
        return base

    @property
    def mean(self):
        return self.base_dist.mean

    @property
    def variance(self):
        return self.base_dist.variance

    def sample(self, key, sample_shape=()):
        return self.base_dist.sample(key, sample_shape)

    def rsample(self, key, sample_shape=()):
        return self.base_dist.rsample(key, sample_shape)

    def log_prob(self, value):
        lp = self.base_dist.log_prob(value)
        return sum_rightmost(lp, self.reinterpreted_batch_ndims)

    def entropy(self):
        ent = self.base_dist.entropy()
        return sum_rightmost(ent, self.reinterpreted_batch_ndims)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        base = self.base_dist.expand(
            batch_shape
            + self.base_dist.batch_shape[
                len(self.base_dist.batch_shape) - self.reinterpreted_batch_ndims:
            ]
        )
        return Independent(base, self.reinterpreted_batch_ndims)

    def to_event(self, reinterpreted_batch_ndims=None):
        if reinterpreted_batch_ndims is None:
            reinterpreted_batch_ndims = len(self.batch_shape)
        if reinterpreted_batch_ndims == 0:
            return self
        # flatten nested Independent (ref torch_distribution.py:172)
        return Independent(
            self.base_dist,
            self.reinterpreted_batch_ndims + reinterpreted_batch_ndims,
        )


class MaskedDistribution(Distribution):
    """Mask log_prob / score_parts elementwise.

    Ref ``torch_distribution.py:302``.  ``mask`` is broadcastable to
    ``batch_shape``; masked-out elements contribute exactly 0.
    """

    arg_constraints: Dict[str, constraints.Constraint] = {}

    def __init__(self, base_dist: Distribution, mask):
        self.base_dist = base_dist
        if isinstance(mask, bool):
            self._mask = mask
            batch_shape = base_dist.batch_shape
        else:
            mask = jnp.asarray(mask)
            batch_shape = broadcast_shape(mask.shape, base_dist.batch_shape)
            self._mask = jnp.broadcast_to(mask, batch_shape).astype(bool)
        super().__init__(batch_shape, base_dist.event_shape)

    @property
    def has_rsample(self):  # type: ignore[override]
        return self.base_dist.has_rsample

    @property
    def has_enumerate_support(self):  # type: ignore[override]
        return self.base_dist.has_enumerate_support

    @property
    def support(self):  # type: ignore[override]
        return self.base_dist.support

    @property
    def mean(self):
        return self.base_dist.mean

    @property
    def variance(self):
        return self.base_dist.variance

    def sample(self, key, sample_shape=()):
        return self.base_dist.expand(self.batch_shape).sample(key, sample_shape)

    def rsample(self, key, sample_shape=()):
        return self.base_dist.expand(self.batch_shape).rsample(key, sample_shape)

    def log_prob(self, value):
        if self._mask is False:
            shape = broadcast_shape(
                self.batch_shape,
                jnp.shape(value)[: max(0, jnp.ndim(value) - self.event_dim)],
            )
            return jnp.zeros(shape)
        if self._mask is True:
            return self.base_dist.log_prob(value)
        lp = self.base_dist.expand(self.batch_shape).log_prob(value)
        return jnp.where(self._mask, lp, 0.0)

    def enumerate_support(self, expand=True):
        return self.base_dist.enumerate_support(expand=expand)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        base = self.base_dist.expand(batch_shape)
        mask = self._mask
        if not isinstance(mask, bool):
            mask = jnp.broadcast_to(mask, batch_shape)
        return MaskedDistribution(base, mask)


class ExpandedDistribution(Distribution):
    """Broadcast a distribution to a larger batch_shape.

    Ref ``torch_distribution.py:399``.
    """

    arg_constraints: Dict[str, constraints.Constraint] = {}

    def __init__(self, base_dist: Distribution, batch_shape=()):
        batch_shape = tuple(batch_shape)
        # validate broadcastability
        broadcast_shape(batch_shape, base_dist.batch_shape)
        if len(batch_shape) < len(base_dist.batch_shape):
            raise ValueError(
                f"cannot expand {base_dist.batch_shape} to smaller {batch_shape}"
            )
        self.base_dist = base_dist
        super().__init__(batch_shape, base_dist.event_shape)

    @property
    def has_rsample(self):  # type: ignore[override]
        return self.base_dist.has_rsample

    @property
    def has_enumerate_support(self):  # type: ignore[override]
        return self.base_dist.has_enumerate_support

    @property
    def support(self):  # type: ignore[override]
        return self.base_dist.support

    @property
    def is_discrete(self):  # type: ignore[override]
        return self.base_dist.is_discrete

    def _broadcast(self, x, sample_shape=()):
        target = tuple(sample_shape) + self.batch_shape + self.event_shape
        return jnp.broadcast_to(x, target)

    def sample(self, key, sample_shape=()):
        # draw with the extra batch dims so samples are i.i.d. across the
        # expanded batch, not tiled
        extra = _expand_extra_dims(self.batch_shape, self.base_dist.batch_shape)
        samp = self.base_dist.sample(key, tuple(sample_shape) + extra)
        return self._reshape_sample(samp, sample_shape, extra)

    def rsample(self, key, sample_shape=()):
        extra = _expand_extra_dims(self.batch_shape, self.base_dist.batch_shape)
        samp = self.base_dist.rsample(key, tuple(sample_shape) + extra)
        return self._reshape_sample(samp, sample_shape, extra)

    def _reshape_sample(self, samp, sample_shape, extra):
        # samp: sample_shape + extra + base_batch + event.  Broadcast base
        # batch dims of size 1 up to the expanded size.
        target = tuple(sample_shape) + self.batch_shape + self.event_shape
        return jnp.broadcast_to(samp, broadcast_shape(samp.shape, target))

    def log_prob(self, value):
        lp = self.base_dist.log_prob(value)
        shape = broadcast_shape(
            self.batch_shape,
            jnp.shape(value)[: max(0, jnp.ndim(value) - self.event_dim)],
        )
        return jnp.broadcast_to(lp, shape)

    def score_parts(self, value, *args, **kwargs):
        parts = self.base_dist.score_parts(value, *args, **kwargs)
        shape = broadcast_shape(
            self.batch_shape,
            jnp.shape(value)[: max(0, jnp.ndim(value) - self.event_dim)],
        )
        return ScoreParts(
            jnp.broadcast_to(parts.log_prob, shape),
            parts.score_function
            if isinstance(parts.score_function, int)
            else jnp.broadcast_to(parts.score_function, shape),
            parts.entropy_term
            if isinstance(parts.entropy_term, int)
            else jnp.broadcast_to(parts.entropy_term, shape),
        )

    def enumerate_support(self, expand=True):
        support = self.base_dist.enumerate_support(expand=False)
        n = support.shape[0]
        support = jnp.reshape(
            support,
            (n,) + (1,) * len(self.batch_shape) + self.event_shape,
        )
        if expand:
            support = jnp.broadcast_to(
                support, (n,) + self.batch_shape + self.event_shape
            )
        return support

    @property
    def mean(self):
        return jnp.broadcast_to(
            self.base_dist.mean, self.batch_shape + self.event_shape
        )

    @property
    def variance(self):
        return jnp.broadcast_to(
            self.base_dist.variance, self.batch_shape + self.event_shape
        )

    def entropy(self):
        return jnp.broadcast_to(self.base_dist.entropy(), self.batch_shape)

    def expand(self, batch_shape, _instance=None):
        return ExpandedDistribution(self.base_dist, tuple(batch_shape))


def _expand_extra_dims(new_batch, old_batch):
    """Leading dims present in new_batch but not broadcast from old_batch."""
    if not old_batch:
        return tuple(new_batch)
    return tuple(new_batch[: len(new_batch) - len(old_batch)])


class TransformedDistribution(Distribution):
    """Push a base distribution through a chain of Transforms
    (torch.distributions.TransformedDistribution semantics)."""

    arg_constraints: Dict[str, constraints.Constraint] = {}

    def __init__(self, base_distribution: Distribution, transforms):
        from .transforms import ComposeTransform, Transform

        if isinstance(transforms, Transform):
            transforms = [transforms]
        self.transforms = list(transforms)
        # shape bookkeeping
        base_shape = base_distribution.shape()
        forward_shape = base_shape
        for t in self.transforms:
            forward_shape = t.forward_shape(forward_shape)
        # event dim of result
        reinterpreted = 0
        event_dim = base_distribution.event_dim
        for t in self.transforms:
            event_dim = max(event_dim, t.domain.event_dim)
            event_dim += t.codomain.event_dim - t.domain.event_dim
        cut = len(forward_shape) - event_dim
        batch_shape = forward_shape[:cut]
        event_shape = forward_shape[cut:]
        # possibly expand base so its batch matches
        base_needed_event = base_distribution.event_dim
        self.base_dist = base_distribution
        super().__init__(batch_shape, event_shape)

    @property
    def has_rsample(self):  # type: ignore[override]
        return self.base_dist.has_rsample

    @property
    def support(self):  # type: ignore[override]
        if not self.transforms:
            return self.base_dist.support
        support = self.transforms[-1].codomain
        if self.event_dim > support.event_dim:
            support = constraints.independent(
                support, self.event_dim - support.event_dim
            )
        return support

    def sample(self, key, sample_shape=()):
        x = self.base_dist.sample(key, sample_shape)
        for t in self.transforms:
            x = t(x)
        return x

    def rsample(self, key, sample_shape=()):
        x = self.base_dist.rsample(key, sample_shape)
        for t in self.transforms:
            x = t(x)
        return x

    def log_prob(self, value):
        event_dim = self.event_dim
        lp = 0.0
        y = value
        for t in reversed(self.transforms):
            x = t._inverse(y)
            event_dim += t.domain.event_dim - t.codomain.event_dim
            ladj = t.log_abs_det_jacobian(x, y)
            lp = lp - sum_rightmost(
                ladj, event_dim - t.domain.event_dim
            )
            y = x
        lp = lp + sum_rightmost(
            self.base_dist.log_prob(y),
            event_dim - self.base_dist.event_dim,
        )
        return lp

    def cdf(self, value):
        y = value
        for t in reversed(self.transforms):
            y = t._inverse(y)
        # only valid for monotone-increasing scalar chains
        return self.base_dist.cdf(y)

    def icdf(self, q):
        x = self.base_dist.icdf(q)
        for t in self.transforms:
            x = t(x)
        return x

    def expand(self, batch_shape, _instance=None):
        # Transforms only touch event dims; trailing base batch dims that were
        # absorbed into the event stay put, leading batch dims expand.
        batch_shape = tuple(batch_shape)
        base = self.base_dist.expand(
            batch_shape + self.base_dist.batch_shape[len(self.batch_shape):]
        )
        return TransformedDistribution(base, self.transforms)
