"""Fused log-space matmul Pallas kernel for the TPU MXU.

The enumeration engine's hot op (SURVEY §2.8 P3) is
``logmatmulexp(x, y)[..., a, c] = logsumexp_b(x[..., a, b] + y[..., b, c])``.
The XLA path (``distributions/hmm._logmatmulexp``) materializes the shifted
exponentials in HBM between ops; this kernel fuses shift → exp → MXU
matmul → log → unshift in VMEM, one HBM round trip per tile.

The kernel is *gridded*: the launch iterates over (batch, M-tile, N-tile)
program ids with the full contraction axis resident in VMEM per tile, so
batched ``(..., S, S)`` operands — the shape class DiscreteHMM's pairwise
time reduction actually produces — route through it, not just single 2-D
tiles.  Routing is automatic from ``DiscreteHMM`` / the LogRing on a TPU
backend when tiles are MXU-sized; otherwise the jnp fallback runs
(identical math).
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

# per-input VMEM budget for one (BM, K) / (K, BN) tile pair, in elements
_VMEM_TILE_ELEMS = 2 * 1024 * 1024

# Measured on TPU v5e: the fused kernel is at *parity* with the XLA-fused
# fallback (0.98x at batch=16, S=512 — the op is VPU-bound by exp/log),
# while its first Mosaic compile over a tunneled device costs ~2 minutes.
# It is therefore opt-in: ``pyro_tpu.settings.set(pallas_logmatmulexp=True)``.
ENABLED = False


def _kernel(x_ref, y_ref, out_ref):
    x = x_ref[0]  # (BM, K)
    y = y_ref[0]  # (K, BN)
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
    out_ref[0] = jnp.log(jnp.maximum(z, tiny)) + xs + ys


def _pick_tile(dim: int, k: int) -> int:
    """Largest power-of-two tile ≤ dim that divides dim and keeps the
    (tile, k) block within the VMEM budget."""
    tile = 256
    while tile > 8 and (dim % tile or tile * k > _VMEM_TILE_ELEMS):
        tile //= 2
    return tile if dim % tile == 0 else dim


@functools.partial(jax.jit, static_argnames=("interpret",))
def _logmatmulexp_pallas(x, y, interpret: bool = False):
    """x: (B, M, K), y: (B, K, N) -> (B, M, N), all float32."""
    b, m, k = x.shape
    b2, k2, n = y.shape
    assert k == k2 and b == b2, (x.shape, y.shape)
    bm = _pick_tile(m, k)
    bn = _pick_tile(n, k)
    grid = (b, m // bm, n // bn)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bm, k), lambda ib, im, jn: (ib, im, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, bn), lambda ib, im, jn: (ib, 0, jn),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, bn), lambda ib, im, jn: (ib, im, jn),
            memory_space=pltpu.VMEM,
        ),
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
    """Gate: opted in, TPU backend, MXU-sized tiles, compatible shapes."""
    if not ENABLED or not _HAS_PALLAS:
        return False
    if x.ndim < 2 or y.ndim < 2:
        return False
    if x.shape[:-2] != y.shape[:-2]:
        return False  # mismatched batch dims: let XLA broadcast
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    if backend != "tpu":
        return False
    m, k = x.shape[-2:]
    n = y.shape[-1]
    # MXU-sized contraction, and a (tile, K) block must fit VMEM
    big_enough = m >= 128 and n >= 128 and k >= 128
    fits = max(m, 256) * k <= _VMEM_TILE_ELEMS * 8
    return big_enough and fits


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
    dx = P * jnp.einsum("...ij,...kj->...ik", gZ, Q)
    dy = Q * jnp.einsum("...ki,...kj->...ij", P, gZ)
    return dx, dy


_fused_logmatmulexp.defvjp(_fused_fwd, _fused_bwd)


def logmatmulexp(x, y):
    """log(exp(x) @ exp(y)): fused, gridded Pallas kernel (with analytic
    custom VJP) on TPU for MXU-sized tiles — batched or 2-D; XLA
    formulation otherwise."""
    if _use_pallas(x, y):
        batch = x.shape[:-2]
        xb = x.reshape((-1,) + x.shape[-2:])
        yb = y.reshape((-1,) + y.shape[-2:])
        out = _fused_logmatmulexp(xb, yb)
        return out.reshape(batch + out.shape[-2:])
    return _logmatmulexp_xla(x, y)
