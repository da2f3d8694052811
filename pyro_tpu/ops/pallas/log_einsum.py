"""Fused log-space matmul Pallas kernel for the TPU MXU.

The enumeration engine's hot op (SURVEY §2.8 P3) is
``logmatmulexp(x, y)[a, c] = logsumexp_b(x[a, b] + y[b, c])``.  The XLA
path (``distributions/hmm._logmatmulexp``) materializes shifted
exponentials in HBM between ops; this kernel fuses shift → exp → MXU
matmul → log → unshift in VMEM, one HBM round trip per tile.

Used automatically by ``DiscreteHMM`` / the LogRing when operands are 2-D
tiles on a TPU backend and large enough to beat dispatch overhead;
otherwise the jnp fallback runs (identical math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _kernel(x_ref, y_ref, out_ref):
    x = x_ref[:]
    y = y_ref[:]
    # max-shift over the contraction dim, clamped finite (all -inf rows)
    xs = jnp.max(x, axis=-1, keepdims=True)
    xs = jnp.where(jnp.isfinite(xs), xs, 0.0)
    ys = jnp.max(y, axis=-2, keepdims=True)
    ys = jnp.where(jnp.isfinite(ys), ys, 0.0)
    z = jnp.dot(
        jnp.exp(x - xs), jnp.exp(y - ys),
        preferred_element_type=jnp.float32,
    )
    tiny = jnp.finfo(jnp.float32).tiny
    out_ref[:] = jnp.log(jnp.maximum(z, tiny)) + xs + ys


@functools.partial(jax.jit, static_argnames=("interpret",))
def _logmatmulexp_pallas(x, y, interpret: bool = False):
    m, k = x.shape
    k2, n = y.shape
    assert k == k2
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.astype(jnp.float32), y.astype(jnp.float32))


def _logmatmulexp_xla(x, y):
    xs = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    ys = jax.lax.stop_gradient(jnp.max(y, axis=-2, keepdims=True))
    xs = jnp.where(jnp.isfinite(xs), xs, 0.0)
    ys = jnp.where(jnp.isfinite(ys), ys, 0.0)
    z = jnp.einsum(
        "...ik,...kj->...ij", jnp.exp(x - xs), jnp.exp(y - ys)
    )
    return jnp.log(jnp.clip(z, jnp.finfo(z.dtype).tiny)) + xs + ys


def _use_pallas(x, y) -> bool:
    if not _HAS_PALLAS:
        return False
    if x.ndim != 2 or y.ndim != 2:
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    if backend != "tpu":
        return False
    m, k = x.shape
    n = y.shape[-1]
    # worth fusing only when the tile is MXU-sized and fits VMEM
    size_ok = m * k + k * n + m * n <= 3 * 1024 * 1024
    big_enough = m >= 128 and n >= 128 and k >= 128
    return size_ok and big_enough


@jax.custom_vjp
def _fused_logmatmulexp(x, y):
    return _logmatmulexp_pallas(x, y)


def _fused_fwd(x, y):
    out = _logmatmulexp_pallas(x, y)
    return out, (x, y, out)


def _fused_bwd(res, g):
    # With P = exp(x - xs), Q = exp(y - ys), Z = P @ Q:
    #   dx = P * ((g / Z) @ Q^T),  dy = Q * (P^T @ (g / Z))
    # all factors are bounded by the shifts.
    x, y, out = res
    xs = jnp.where(
        jnp.isfinite(jnp.max(x, -1, keepdims=True)),
        jnp.max(x, -1, keepdims=True),
        0.0,
    )
    ys = jnp.where(
        jnp.isfinite(jnp.max(y, -2, keepdims=True)),
        jnp.max(y, -2, keepdims=True),
        0.0,
    )
    P = jnp.exp(x - xs)
    Q = jnp.exp(y - ys)
    gZ = g * jnp.exp(-(out - xs - ys))  # g / Z, bounded
    dx = P * (gZ @ Q.T)
    dy = Q * (P.T @ gZ)
    return dx, dy


_fused_logmatmulexp.defvjp(_fused_fwd, _fused_bwd)


def logmatmulexp(x, y):
    """log(exp(x) @ exp(y)): fused Pallas kernel (with analytic custom VJP)
    on TPU for MXU-sized 2-D tiles; XLA formulation otherwise."""
    if _use_pallas(x, y):
        return _fused_logmatmulexp(x, y)
    return _logmatmulexp_xla(x, y)
