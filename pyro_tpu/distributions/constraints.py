"""Constraints on distribution parameters and supports.

Ref ``torch.distributions.constraints`` plus Pyro's extensions at
``pyro/distributions/constraints.py`` (sphere, corr_matrix, ordered_vector,
positive_ordered_vector, ...).  A constraint knows its ``event_dim`` and can
``check`` values; ``biject_to``/``transform_to`` (in ``transforms.py``) map
constraints to unconstraining bijectors for HMC and autoguides.
"""

from __future__ import annotations

import jax.numpy as jnp


class Constraint:
    is_discrete = False
    event_dim = 0

    def check(self, value):
        raise NotImplementedError

    def __repr__(self) -> str:
        return self.__class__.__name__[1:].replace("_", "") + "()"

    def __eq__(self, other) -> bool:
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self) -> int:
        return hash((type(self), tuple(sorted(self.__dict__.items()))))


class _Dependent(Constraint):
    def __init__(self, *, is_discrete=False, event_dim=0):
        self.is_discrete = is_discrete
        self.event_dim = event_dim

    def check(self, value):
        raise ValueError("cannot check a dependent constraint")


def is_dependent(constraint) -> bool:
    return isinstance(constraint, _Dependent)


class _IndependentConstraint(Constraint):
    """Reinterpret batch dims of a base constraint as event dims."""

    def __init__(self, base_constraint: Constraint, reinterpreted_batch_ndims: int):
        self.base_constraint = base_constraint
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims

    @property
    def is_discrete(self):  # type: ignore[override]
        return self.base_constraint.is_discrete

    @property
    def event_dim(self):  # type: ignore[override]
        return self.base_constraint.event_dim + self.reinterpreted_batch_ndims

    def check(self, value):
        result = self.base_constraint.check(value)
        if self.reinterpreted_batch_ndims:
            result = jnp.all(
                jnp.reshape(
                    result,
                    result.shape[: result.ndim - self.reinterpreted_batch_ndims]
                    + (-1,),
                ),
                axis=-1,
            )
        return result

    def __repr__(self) -> str:
        return f"independent({self.base_constraint}, {self.reinterpreted_batch_ndims})"


class _Boolean(Constraint):
    is_discrete = True

    def check(self, value):
        return (value == 0) | (value == 1)


class _Real(Constraint):
    def check(self, value):
        return value == value  # not NaN


class _GreaterThan(Constraint):
    def __init__(self, lower_bound):
        self.lower_bound = lower_bound

    def check(self, value):
        return value > self.lower_bound


class _GreaterThanEq(Constraint):
    def __init__(self, lower_bound):
        self.lower_bound = lower_bound

    def check(self, value):
        return value >= self.lower_bound


class _LessThan(Constraint):
    def __init__(self, upper_bound):
        self.upper_bound = upper_bound

    def check(self, value):
        return value < self.upper_bound


class _Interval(Constraint):
    def __init__(self, lower_bound, upper_bound):
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound

    def check(self, value):
        return (value >= self.lower_bound) & (value <= self.upper_bound)


class _OpenInterval(_Interval):
    def check(self, value):
        return (value > self.lower_bound) & (value < self.upper_bound)


class _IntegerInterval(Constraint):
    is_discrete = True

    def __init__(self, lower_bound, upper_bound):
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound

    def check(self, value):
        return (
            (value % 1 == 0)
            & (value >= self.lower_bound)
            & (value <= self.upper_bound)
        )


class _IntegerGreaterThan(Constraint):
    is_discrete = True

    def __init__(self, lower_bound):
        self.lower_bound = lower_bound

    def check(self, value):
        return (value % 1 == 0) & (value >= self.lower_bound)


class _Simplex(Constraint):
    event_dim = 1

    def check(self, value):
        return jnp.all(value >= 0, axis=-1) & (
            jnp.abs(jnp.sum(value, axis=-1) - 1.0) < 1e-6
        )


class _Multinomial(Constraint):
    is_discrete = True
    event_dim = 1

    def __init__(self, upper_bound):
        self.upper_bound = upper_bound

    def check(self, value):
        return jnp.all(value >= 0, axis=-1) & (
            jnp.sum(value, axis=-1) <= self.upper_bound
        )


class _OrderedVector(Constraint):
    event_dim = 1

    def check(self, value):
        if value.shape[-1] <= 1:
            return jnp.ones(value.shape[:-1], bool)
        return jnp.all(value[..., 1:] > value[..., :-1], axis=-1)


class _PositiveOrderedVector(Constraint):
    event_dim = 1

    def check(self, value):
        return _OrderedVector().check(value) & jnp.all(value > 0, axis=-1)


class _LowerTriangular(Constraint):
    event_dim = 2

    def check(self, value):
        tril = jnp.tril(value)
        return jnp.all(
            jnp.reshape(tril == value, value.shape[:-2] + (-1,)), axis=-1
        )


class _LowerCholesky(Constraint):
    event_dim = 2

    def check(self, value):
        tril_ok = _LowerTriangular().check(value)
        diag_ok = jnp.all(
            jnp.diagonal(value, axis1=-2, axis2=-1) > 0, axis=-1
        )
        return tril_ok & diag_ok


class _UnitLowerCholesky(Constraint):
    event_dim = 2

    def check(self, value):
        tril_ok = _LowerTriangular().check(value)
        diag_ok = jnp.all(
            jnp.abs(jnp.diagonal(value, axis1=-2, axis2=-1) - 1.0) < 1e-6,
            axis=-1,
        )
        return tril_ok & diag_ok


class _CorrCholesky(Constraint):
    event_dim = 2

    def check(self, value):
        row_norm = jnp.linalg.norm(value, axis=-1)
        unit_row = jnp.all(jnp.abs(row_norm - 1.0) < 1e-4, axis=-1)
        return _LowerCholesky().check(value) & unit_row


class _CorrMatrix(Constraint):
    event_dim = 2

    def check(self, value):
        unit_diag = jnp.all(
            jnp.abs(jnp.diagonal(value, axis1=-2, axis2=-1) - 1.0) < 1e-6,
            axis=-1,
        )
        return _PositiveDefinite().check(value) & unit_diag


class _PositiveDefinite(Constraint):
    event_dim = 2

    def check(self, value):
        sym = jnp.all(
            jnp.reshape(
                jnp.abs(value - jnp.swapaxes(value, -1, -2)) < 1e-6,
                value.shape[:-2] + (-1,),
            ),
            axis=-1,
        )
        eig_ok = jnp.linalg.eigvalsh(value)[..., 0] > 0
        return sym & eig_ok


class _PositiveSemidefinite(_PositiveDefinite):
    def check(self, value):
        sym = jnp.all(
            jnp.reshape(
                jnp.abs(value - jnp.swapaxes(value, -1, -2)) < 1e-6,
                value.shape[:-2] + (-1,),
            ),
            axis=-1,
        )
        eig_ok = jnp.linalg.eigvalsh(value)[..., 0] >= -1e-6
        return sym & eig_ok


class _SoftplusPositive(_GreaterThan):
    def __init__(self):
        super().__init__(0.0)


class _SoftplusLowerCholesky(_LowerCholesky):
    pass


class _Sphere(Constraint):
    """Unit-norm vectors (ref ``pyro/distributions/constraints.py`` sphere)."""

    event_dim = 1
    reltol = 10.0

    def check(self, value):
        eps = jnp.finfo(value.dtype).eps
        norm = jnp.linalg.norm(value, axis=-1)
        error = jnp.abs(norm - 1)
        return error < self.reltol * eps * value.shape[-1] ** 0.5


class _RealVector(_IndependentConstraint):
    def __init__(self):
        super().__init__(_Real(), 1)


# Public singletons / factories (mirrors torch + pyro naming)
dependent = _Dependent()
boolean = _Boolean()
real = _Real()
real_vector = _IndependentConstraint(_Real(), 1)
positive = _GreaterThan(0.0)
nonnegative = _GreaterThanEq(0.0)
negative = _LessThan(0.0)
unit_interval = _Interval(0.0, 1.0)
open_interval = _OpenInterval
interval = _Interval
greater_than = _GreaterThan
greater_than_eq = _GreaterThanEq
less_than = _LessThan
integer_interval = _IntegerInterval
integer_greater_than = _IntegerGreaterThan
nonnegative_integer = _IntegerGreaterThan(0)
positive_integer = _IntegerGreaterThan(1)
simplex = _Simplex()
multinomial = _Multinomial
ordered_vector = _OrderedVector()
positive_ordered_vector = _PositiveOrderedVector()
lower_triangular = _LowerTriangular()
lower_cholesky = _LowerCholesky()
unit_lower_cholesky = _UnitLowerCholesky()
corr_cholesky = _CorrCholesky()
corr_matrix = _CorrMatrix()
positive_definite = _PositiveDefinite()
positive_semidefinite = _PositiveSemidefinite()
softplus_positive = _SoftplusPositive()
softplus_lower_cholesky = _SoftplusLowerCholesky()
sphere = _Sphere()
independent = _IndependentConstraint

__all__ = [
    "Constraint",
    "boolean",
    "corr_cholesky",
    "corr_matrix",
    "dependent",
    "greater_than",
    "greater_than_eq",
    "independent",
    "integer_greater_than",
    "integer_interval",
    "interval",
    "is_dependent",
    "less_than",
    "lower_cholesky",
    "lower_triangular",
    "multinomial",
    "negative",
    "nonnegative",
    "nonnegative_integer",
    "open_interval",
    "ordered_vector",
    "positive",
    "positive_definite",
    "positive_integer",
    "positive_ordered_vector",
    "positive_semidefinite",
    "real",
    "real_vector",
    "simplex",
    "softplus_lower_cholesky",
    "softplus_positive",
    "sphere",
    "unit_interval",
    "unit_lower_cholesky",
]
