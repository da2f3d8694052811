"""Native named-tensor term algebra (the funsor core, rebuilt on JAX).

Ref ``pyro/contrib/funsor`` delegates to the external ``funsor`` package
(``funsor/terms.py``, ``funsor/tensor.py``) for a term algebra over
tensors with *named* inputs: free variables with typed domains, pointwise
ops that align operands by name, reductions over named variables, and
substitution.  This module provides the same algebra natively:

  * :class:`Bint` / :class:`Reals` / ``Real`` — typed domains.
  * :class:`Tensor` — a JAX array whose leading axes are named inputs
    (one per free variable) followed by the output event shape.  Binary
    ops align by input *name* (never by position), reductions eliminate
    named inputs, and calling a tensor substitutes values for names
    (integers index, bint tensors gather, variables rename).
  * :class:`Variable` / :class:`Number` — symbolic leaves.  Ops on a
    bint variable materialize it to an ``arange`` tensor (funsor's eager
    interpretation); ops on a real variable build a lazy :class:`Binary`
    / :class:`Unary` / :class:`Reduce` term that evaluates on
    substitution.
  * :mod:`ops` — the op namespace (``ops.logaddexp``, ``ops.add``, ...)
    shared by pointwise application and reduction.

Everything lowers to plain XLA array ops; contraction-heavy consumers
(TVE, markov products) should keep using ``pyro_tpu.ops.contract``, which
is the optimized engine for those — this module is the *interface*
algebra that makes named-dim programs expressible and convertible via
``to_funsor`` / ``to_data``.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
from jax.scipy.special import logsumexp as _logsumexp

__all__ = [
    "Bint",
    "Binary",
    "Funsor",
    "Number",
    "Real",
    "Reals",
    "Reduce",
    "Tensor",
    "Unary",
    "Variable",
    "ops",
    "to_funsor",
    "to_data",
]


# --------------------------------------------------------------------------
# domains


class Domain:
    """Type of a funsor's output or of one of its named inputs."""

    __slots__ = ("dtype", "shape")

    def __init__(self, dtype, shape=()):
        assert dtype == "real" or (isinstance(dtype, int) and dtype > 0)
        self.dtype = dtype  # "real" or a bounded-int cardinality
        self.shape = tuple(shape)

    @property
    def size(self):
        assert self.dtype != "real" and not self.shape
        return self.dtype

    @property
    def num_elements(self):
        n = 1
        for s in self.shape:
            n *= s
        return n

    def __eq__(self, other):
        return (
            isinstance(other, Domain)
            and self.dtype == other.dtype
            and self.shape == other.shape
        )

    def __hash__(self):
        return hash((self.dtype, self.shape))

    def __repr__(self):
        if self.dtype == "real":
            return "Real" if not self.shape else f"Reals{self.shape}"
        return f"Bint({self.dtype})"


def Bint(size):
    return Domain(int(size))


def Reals(*shape):
    return Domain("real", shape)


Real = Reals()


# --------------------------------------------------------------------------
# ops


class Op:
    """A scalar/elementwise op usable pointwise and (optionally) as a
    reduction (with the associated unit)."""

    def __init__(self, name, fn, reduce_fn=None):
        self.name = name
        self._fn = fn
        self._reduce_fn = reduce_fn

    def __call__(self, *args):
        return self._fn(*args)

    def reduce(self, data, axes):
        if self._reduce_fn is None:
            raise ValueError(f"op {self.name} is not a reduction op")
        if not axes:
            return data
        return self._reduce_fn(data, tuple(axes))

    def __repr__(self):
        return f"ops.{self.name}"


class _OpsNamespace:
    add = Op("add", lambda a, b: a + b, lambda d, ax: jnp.sum(d, axis=ax))
    sub = Op("sub", lambda a, b: a - b)
    mul = Op("mul", lambda a, b: a * b, lambda d, ax: jnp.prod(d, axis=ax))
    truediv = Op("truediv", lambda a, b: a / b)
    pow = Op("pow", lambda a, b: a**b)
    max = Op("max", jnp.maximum, lambda d, ax: jnp.max(d, axis=ax))
    min = Op("min", jnp.minimum, lambda d, ax: jnp.min(d, axis=ax))
    logaddexp = Op(
        "logaddexp", jnp.logaddexp, lambda d, ax: _logsumexp(d, axis=ax)
    )
    neg = Op("neg", lambda a: -a)
    abs = Op("abs", jnp.abs)
    exp = Op("exp", jnp.exp)
    log = Op("log", jnp.log)
    log1p = Op("log1p", jnp.log1p)
    sqrt = Op("sqrt", jnp.sqrt)
    sigmoid = Op("sigmoid", lambda a: 1.0 / (1.0 + jnp.exp(-a)))
    tanh = Op("tanh", jnp.tanh)


ops = _OpsNamespace()

_BINARY_OPS = {
    "add": ops.add,
    "sub": ops.sub,
    "mul": ops.mul,
    "truediv": ops.truediv,
    "pow": ops.pow,
}


# --------------------------------------------------------------------------
# terms


class Funsor:
    """Base term: ``.inputs`` maps free-variable names to domains,
    ``.output`` is the result domain."""

    inputs: "OrderedDict[str, Domain]"
    output: Domain

    @property
    def dtype(self):
        return self.output.dtype

    # -- operator sugar ----------------------------------------------------
    def __add__(self, other):
        return _apply_binary(ops.add, self, other)

    def __radd__(self, other):
        return _apply_binary(ops.add, other, self)

    def __sub__(self, other):
        return _apply_binary(ops.sub, self, other)

    def __rsub__(self, other):
        return _apply_binary(ops.sub, other, self)

    def __mul__(self, other):
        return _apply_binary(ops.mul, self, other)

    def __rmul__(self, other):
        return _apply_binary(ops.mul, other, self)

    def __truediv__(self, other):
        return _apply_binary(ops.truediv, self, other)

    def __pow__(self, other):
        return _apply_binary(ops.pow, self, other)

    def __neg__(self):
        return _apply_unary(ops.neg, self)

    def exp(self):
        return _apply_unary(ops.exp, self)

    def log(self):
        return _apply_unary(ops.log, self)

    def reduce(self, op, reduced_vars=None):
        """Eliminate named inputs with ``op`` (all of them by default)."""
        if reduced_vars is None:
            reduced_vars = frozenset(self.inputs)
        if isinstance(reduced_vars, str):
            reduced_vars = frozenset([reduced_vars])
        reduced_vars = frozenset(
            v.name if isinstance(v, Variable) else v for v in reduced_vars
        )
        extra = reduced_vars - frozenset(self.inputs)
        if extra:
            raise ValueError(f"cannot reduce over missing inputs {sorted(extra)}")
        return self._reduce(op, reduced_vars)

    def __call__(self, **subs):
        """Substitute values for named inputs."""
        subs = {k: v for k, v in subs.items() if k in self.inputs}
        if not subs:
            return self
        return self._subs(subs)

    # -- conversions -------------------------------------------------------
    def item(self):
        raise ValueError(f"cannot convert {type(self).__name__} to a scalar")


def _to_funsor_operand(x, like=None):
    if isinstance(x, Funsor):
        return x
    if isinstance(x, (int, float)):
        return Number(x)
    data = jnp.asarray(x)
    if data.ndim == 0:
        return Tensor(data)
    raise TypeError(
        f"cannot coerce {type(x).__name__} to a Funsor operand; use "
        "to_funsor(...) with an explicit dim_to_name for batched arrays"
    )


class Number(Funsor):
    """A typed scalar constant."""

    def __init__(self, value, dtype="real"):
        self.data = value
        self.inputs = OrderedDict()
        self.output = Domain(dtype)
        if dtype != "real":
            assert 0 <= int(value) < dtype

    def _reduce(self, op, reduced_vars):
        return self

    def _subs(self, subs):
        return self

    def item(self):
        return self.data

    def __repr__(self):
        return f"Number({self.data}, {self.output})"


class Variable(Funsor):
    """A free variable with a typed domain."""

    def __init__(self, name, domain):
        assert isinstance(domain, Domain)
        self.name = name
        self.inputs = OrderedDict([(name, domain)])
        self.output = domain

    def materialize(self):
        """Expand a bint variable to its range tensor (funsor's eager
        interpretation of ops on discrete variables)."""
        if self.output.dtype == "real":
            return None
        n = self.output.size
        return Tensor(
            jnp.arange(n), OrderedDict([(self.name, self.output)]), dtype=n
        )

    def _reduce(self, op, reduced_vars):
        m = self.materialize()
        if m is None:
            return Reduce(op, self, reduced_vars)
        return m._reduce(op, reduced_vars)

    def _subs(self, subs):
        value = subs.get(self.name, self)
        if isinstance(value, Funsor):
            return value
        if isinstance(value, (int, float)):
            return Number(value, self.output.dtype)
        return Tensor(jnp.asarray(value), dtype=self.output.dtype)

    def __repr__(self):
        return f"Variable('{self.name}', {self.output})"


class Tensor(Funsor):
    """Eager named tensor: ``data.shape == input sizes + output.shape``,
    one leading axis per named input, in ``inputs`` order."""

    def __init__(self, data, inputs=None, dtype="real"):
        inputs = OrderedDict() if inputs is None else OrderedDict(inputs)
        data = jnp.asarray(data)
        batch_shape = tuple(d.size for d in inputs.values())
        assert data.shape[: len(batch_shape)] == batch_shape, (
            data.shape,
            inputs,
        )
        self.data = data
        self.inputs = inputs
        self.output = Domain(dtype, data.shape[len(batch_shape) :])

    # -- helpers -----------------------------------------------------------
    def _axis(self, name):
        return list(self.inputs).index(name)

    def align(self, names):
        """Permute the named axes into the given order (must be a
        permutation of ``self.inputs``)."""
        names = tuple(names)
        assert frozenset(names) == frozenset(self.inputs)
        if names == tuple(self.inputs):
            return self
        perm = [self._axis(n) for n in names]
        perm += list(range(len(self.inputs), self.data.ndim))
        data = jnp.transpose(self.data, perm)
        return Tensor(
            data,
            OrderedDict((n, self.inputs[n]) for n in names),
            self.output.dtype,
        )

    def _expand_data(self, union_inputs):
        """Raw data broadcast against a superset input ordering."""
        present = [n for n in union_inputs if n in self.inputs]
        aligned = self.align(present) if present else self
        shape = tuple(
            union_inputs[n].size if n in self.inputs else 1
            for n in union_inputs
        ) + self.output.shape
        return aligned.data.reshape(shape)

    # -- algebra -----------------------------------------------------------
    def _reduce(self, op, reduced_vars):
        axes = [self._axis(n) for n in self.inputs if n in reduced_vars]
        data = op.reduce(self.data, axes)
        inputs = OrderedDict(
            (n, d) for n, d in self.inputs.items() if n not in reduced_vars
        )
        return Tensor(data, inputs, self.output.dtype)

    def _subs(self, subs):
        result = self
        # renames first (cheap), then indexing substitutions
        for name, value in subs.items():
            if isinstance(value, str):
                value = Variable(value, result.inputs[name])
            if isinstance(value, Variable):
                assert value.output == result.inputs[name]
                inputs = OrderedDict(
                    (value.name if n == name else n, d)
                    for n, d in result.inputs.items()
                )
                result = Tensor(result.data, inputs, result.output.dtype)
        for name, value in subs.items():
            if isinstance(value, (str, Variable)):
                continue
            if name not in result.inputs:
                continue
            result = result._subs_one(name, value)
        return result

    def _subs_one(self, name, value):
        domain = self.inputs[name]
        if isinstance(value, (int, jnp.integer)) or (
            isinstance(value, Number) and value.output.dtype != "real"
        ):
            idx = int(value.data if isinstance(value, Number) else value)
            data = jnp.take(self.data, idx, axis=self._axis(name))
            inputs = OrderedDict(
                (n, d) for n, d in self.inputs.items() if n != name
            )
            return Tensor(data, inputs, self.output.dtype)
        if not isinstance(value, Funsor):
            value = Tensor(jnp.asarray(value), dtype=domain.dtype)
        if isinstance(value, Variable):
            return self._subs({name: value})
        assert isinstance(value, Tensor) and value.output == Domain(
            domain.dtype
        ), f"substitution for '{name}' must be a bint scalar tensor"
        # general gather, possibly diagonal (index shares inputs with self):
        # one-hot mask over the substituted axis, sum it out.  Exact for all
        # dtypes; named alignment reuses the binary-op machinery.
        remaining = OrderedDict(
            (n, d) for n, d in self.inputs.items() if n != name
        )
        union = OrderedDict(remaining)
        for n, d in value.inputs.items():
            if n in union:
                assert union[n] == d
            else:
                union[n] = d
        # self data with axes: union... , k, event...
        moved = self.align([n for n in self.inputs if n != name] + [name])
        self_data = jnp.moveaxis(
            moved._expand_data(
                OrderedDict(list(union.items()) + [(name, domain)])
            ),
            len(union),
            len(union),
        )  # shape union + (k,) + event
        idx_data = value._expand_data(union)  # shape union
        mask = (
            idx_data[..., None] == jnp.arange(domain.size)
        )  # union + (k,)
        mask = mask.reshape(mask.shape + (1,) * len(self.output.shape))
        picked = jnp.sum(
            jnp.where(mask, self_data, jnp.zeros((), self_data.dtype)),
            axis=len(union),
        )
        return Tensor(picked, union, self.output.dtype)

    def item(self):
        if self.inputs or self.output.shape:
            raise ValueError("only scalar funsors can be converted to scalars")
        return self.data.item()

    def __repr__(self):
        return f"Tensor({dict(self.inputs)}, output={self.output})"


# --------------------------------------------------------------------------
# lazy terms (real-domain variables keep ops symbolic until substitution)


class Unary(Funsor):
    def __init__(self, op, arg):
        self.op = op
        self.arg = arg
        self.inputs = OrderedDict(arg.inputs)
        self.output = Domain("real", arg.output.shape)

    def _subs(self, subs):
        return _apply_unary(self.op, self.arg(**subs))

    def _reduce(self, op, reduced_vars):
        return Reduce(op, self, reduced_vars)

    def __repr__(self):
        return f"Unary({self.op}, {self.arg!r})"


class Binary(Funsor):
    def __init__(self, op, lhs, rhs):
        self.op = op
        self.lhs = lhs
        self.rhs = rhs
        inputs = OrderedDict(lhs.inputs)
        for n, d in rhs.inputs.items():
            if n in inputs:
                assert inputs[n] == d, f"conflicting domains for '{n}'"
            else:
                inputs[n] = d
        self.inputs = inputs
        shape = jnp.broadcast_shapes(lhs.output.shape, rhs.output.shape)
        self.output = Domain("real", shape)

    def _subs(self, subs):
        return _apply_binary(self.op, self.lhs(**subs), self.rhs(**subs))

    def _reduce(self, op, reduced_vars):
        # sum/logsumexp distributes over disjoint lazy halves only when one
        # side is constant in the reduced vars; keep it simple and lazy.
        return Reduce(op, self, reduced_vars)

    def __repr__(self):
        return f"Binary({self.op}, {self.lhs!r}, {self.rhs!r})"


class Reduce(Funsor):
    def __init__(self, op, arg, reduced_vars):
        self.op = op
        self.arg = arg
        self.reduced_vars = frozenset(reduced_vars)
        self.inputs = OrderedDict(
            (n, d) for n, d in arg.inputs.items() if n not in self.reduced_vars
        )
        self.output = arg.output

    def _subs(self, subs):
        subs = {k: v for k, v in subs.items() if k not in self.reduced_vars}
        return self.arg(**subs).reduce(self.op, self.reduced_vars)

    def _reduce(self, op, reduced_vars):
        return Reduce(op, self, reduced_vars)

    def __repr__(self):
        return f"Reduce({self.op}, {self.arg!r}, {set(self.reduced_vars)})"


# --------------------------------------------------------------------------
# eager dispatch


def _materialize(x):
    if isinstance(x, Variable):
        m = x.materialize()
        if m is not None:
            return m
    return x


def _apply_unary(op, arg):
    arg = _materialize(_to_funsor_operand(arg))
    if isinstance(arg, Number):
        return Number(op(arg.data))
    if isinstance(arg, Tensor):
        return Tensor(op(arg.data), arg.inputs, "real")
    return Unary(op, arg)


def _apply_binary(op, lhs, rhs):
    lhs = _materialize(_to_funsor_operand(lhs))
    rhs = _materialize(_to_funsor_operand(rhs))
    if isinstance(lhs, Number) and isinstance(rhs, Number):
        return Number(op(lhs.data, rhs.data))
    if isinstance(lhs, Number) and isinstance(rhs, Tensor):
        return Tensor(op(lhs.data, rhs.data), rhs.inputs, "real")
    if isinstance(lhs, Tensor) and isinstance(rhs, Number):
        return Tensor(op(lhs.data, rhs.data), lhs.inputs, "real")
    if isinstance(lhs, Tensor) and isinstance(rhs, Tensor):
        union = OrderedDict(lhs.inputs)
        for n, d in rhs.inputs.items():
            if n in union:
                assert union[n] == d, f"conflicting domains for '{n}'"
            else:
                union[n] = d
        data = op(lhs._expand_data(union), rhs._expand_data(union))
        return Tensor(data, union, "real")
    return Binary(op, lhs, rhs)


# --------------------------------------------------------------------------
# conversions (funsor.to_funsor / funsor.to_data semantics)


def to_funsor(x, output=None, dim_to_name=None):
    """Convert a positionally-batched array to a named :class:`Tensor`.

    ``output`` names the event domain (default scalar ``Real``); axes to
    its left are batch dims addressed by *negative offsets from the
    rightmost batch dim* via ``dim_to_name``, as in
    ``funsor.tensor.tensor_to_funsor``.  Size-1 batch dims are squeezed.
    """
    if isinstance(x, Funsor):
        return x
    if isinstance(x, (int, float)):
        return Number(x) if output is None else Number(x, output.dtype)
    data = jnp.asarray(x)
    output = Real if output is None else output
    event_ndim = len(output.shape)
    batch_shape = data.shape[: data.ndim - event_ndim]
    dim_to_name = dim_to_name or OrderedDict()
    inputs = OrderedDict()
    keep = []
    for i, size in enumerate(batch_shape):
        dim = i - len(batch_shape)
        if size == 1:
            continue
        if dim not in dim_to_name:
            raise ValueError(
                f"batch dim {dim} (size {size}) has no name; pass "
                "dim_to_name or enter a named context"
            )
        name = dim_to_name[dim]
        inputs[name] = Bint(size)
        keep.append(i)
    squeezed = data.reshape(
        tuple(batch_shape[i] for i in keep) + output.shape
    )
    return Tensor(squeezed, inputs, output.dtype)


def to_data(x, name_to_dim=None):
    """Convert a named :class:`Tensor` back to a positionally-batched
    array: each named input lands at its (negative) dim, size-1 axes pad
    the gaps (``funsor.tensor.funsor_to_tensor`` semantics)."""
    if isinstance(x, Number):
        return x.data
    if not isinstance(x, Tensor):
        raise ValueError(
            f"cannot convert lazy funsor {type(x).__name__} to data; "
            "substitute its free real variables first"
        )
    if not x.inputs:
        return x.data
    name_to_dim = name_to_dim or {}
    missing = [n for n in x.inputs if n not in name_to_dim]
    if missing:
        raise ValueError(f"no dims for named inputs {missing}")
    dims = {n: name_to_dim[n] for n in x.inputs}
    assert len(set(dims.values())) == len(dims), "name_to_dim is not 1-1"
    min_dim = min(dims.values())
    batch_shape = [1] * (-min_dim)
    for n, d in x.inputs.items():
        batch_shape[dims[n]] = d.size
    order = sorted(x.inputs, key=lambda n: dims[n])
    aligned = x.align(order)
    return aligned.data.reshape(tuple(batch_shape) + x.output.shape)
