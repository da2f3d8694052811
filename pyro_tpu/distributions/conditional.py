"""Conditional distribution / transform interfaces.

Ref ``pyro/distributions/conditional.py``: ``ConditionalDistribution:7``,
``ConditionalTransform:17``, ``ConditionalTransformModule:40``,
``ConditionalTransformedDistribution:71``, and
``torch_transform.py`` (``TransformModule``, ``ComposeTransformModule``).

In this functional JAX design a "transform module" is simply a Transform
whose parameters are captured arrays (typically produced by ``pyro.param``
or a flax bridge), so ``TransformModule`` is the plain ``Transform`` base
and ``ComposeTransformModule`` composes a list of them.  The conditional
variants carry a ``condition(context)`` method returning the
context-specialized unconditional object, exactly as in the reference.
"""

from __future__ import annotations

from . import constraints
from .distribution import Distribution, TransformedDistribution
from .transforms import ComposeTransform, Transform

# In the reference, TransformModule = Transform + nn.Module (learnable
# parameters).  Parameters here are explicit arrays, so the base suffices.
TransformModule = Transform


class ComposeTransformModule(ComposeTransform):
    """Composition of (learnable) transforms (ref ``torch_transform.py``)."""

    def __init__(self, parts):
        super().__init__(list(parts))

    def __iter__(self):
        return iter(self.parts)


class ConditionalDistribution:
    """Ref ``conditional.py:7``."""

    def condition(self, context) -> Distribution:
        raise NotImplementedError


class ConditionalTransform:
    """Ref ``conditional.py:17``."""

    def condition(self, context) -> Transform:
        raise NotImplementedError


class ConstantConditionalDistribution(ConditionalDistribution):
    """A ConditionalDistribution ignoring its context (ref :23)."""

    def __init__(self, base_dist):
        assert isinstance(base_dist, Distribution)
        self.base_dist = base_dist

    def condition(self, context):
        return self.base_dist


class ConstantConditionalTransform(ConditionalTransform):
    """A ConditionalTransform ignoring its context (ref :31)."""

    def __init__(self, transform):
        assert isinstance(transform, Transform)
        self.transform = transform

    def condition(self, context):
        return self.transform

    def clear_cache(self):
        pass


class ConditionalTransformModule(ConditionalTransform):
    """Conditional transform with learnable parameters (ref
    ``conditional.py:26-43``); subclasses implement ``condition``.
    Carries the torch-parity surface: domain/codomain/bijective defaults
    (vector flows) and a lazy ``inv`` view whose ``condition(context)``
    is the conditioned transform's inverse."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    @property
    def inv(self) -> "ConditionalTransformModule":
        return _ConditionalInverseTransformModule(self)


class _ConditionalInverseTransformModule(ConditionalTransformModule):
    """Ref ``conditional.py:45-55``."""

    def __init__(self, transform: ConditionalTransform):
        self._transform = transform

    @property
    def inv(self) -> ConditionalTransform:
        return self._transform

    def condition(self, context):
        return self._transform.condition(context).inv


class ConditionalComposeTransformModule(ConditionalTransformModule):
    """Compose a sequence of conditional and/or constant transforms
    (ref ``conditional.py:52``)."""

    def __init__(self, parts):
        self.parts = [
            p
            if isinstance(p, ConditionalTransform)
            else ConstantConditionalTransform(p)
            for p in parts
        ]

    def condition(self, context):
        return ComposeTransformModule(
            [p.condition(context) for p in self.parts]
        )


class ConditionalTransformedDistribution(ConditionalDistribution):
    """Ref ``conditional.py:71``."""

    def __init__(self, base_dist, transforms):
        self.base_dist = (
            base_dist
            if isinstance(base_dist, ConditionalDistribution)
            else ConstantConditionalDistribution(base_dist)
        )
        self.transforms = [
            t
            if isinstance(t, ConditionalTransform)
            else ConstantConditionalTransform(t)
            for t in transforms
        ]

    def condition(self, context):
        base_dist = self.base_dist.condition(context)
        # with_cache mirrors the reference flows' cache_size=1 default:
        # forward-only conditional flows (planar, radial, ...) are scored
        # at their own samples via the (x, y) memo
        transforms = [
            t.condition(context).with_cache() for t in self.transforms
        ]
        return TransformedDistribution(base_dist, transforms)

    def clear_cache(self):
        pass
