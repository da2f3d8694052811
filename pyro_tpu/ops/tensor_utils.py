"""Tensor utilities (ref ``pyro/ops/tensor_utils.py``): block-diag embed,
convolution, repeated matmul, orthonormal DCT/Haar transforms, safe
cholesky helpers."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def block_diag_embed(mat):
    """(..., B, M, N) -> (..., B*M, B*N) block diagonal (ref ``:24``)."""
    B, M, N = mat.shape[-3:]
    blocks = mat.reshape(mat.shape[:-3] + (B, M, N))
    result = jnp.zeros(mat.shape[:-3] + (B * M, B * N), mat.dtype)
    for b in range(B):
        result = result.at[
            ..., b * M : (b + 1) * M, b * N : (b + 1) * N
        ].set(blocks[..., b, :, :])
    return result


def block_diagonal(mat, block_size: int):
    """Extract blocks from a block-diagonal matrix (ref ``:43``)."""
    B = mat.shape[-2] // block_size
    out = []
    for b in range(B):
        out.append(
            mat[
                ...,
                b * block_size : (b + 1) * block_size,
                b * block_size : (b + 1) * block_size,
            ]
        )
    return jnp.stack(out, axis=-3)


def next_fast_len(size: int) -> int:
    """Next 2^a 3^b size for FFT (ref ``:16``)."""
    n = size
    while True:
        m = n
        while m % 2 == 0:
            m //= 2
        while m % 3 == 0:
            m //= 3
        if m == 1:
            return n
        n += 1


def convolve(signal, kernel, mode: str = "full"):
    """FFT-based batched 1-D convolution (ref ``:66``)."""
    m = signal.shape[-1]
    n = kernel.shape[-1]
    if mode == "full":
        truncate = m + n - 1
    elif mode == "valid":
        truncate = max(m, n) - min(m, n) + 1
    elif mode == "same":
        truncate = max(m, n)
    else:
        raise ValueError(f"unknown mode: {mode}")
    padded = next_fast_len(m + n - 1)
    f_signal = jnp.fft.rfft(signal, n=padded)
    f_kernel = jnp.fft.rfft(kernel, n=padded)
    result = jnp.fft.irfft(f_signal * f_kernel, n=padded)
    start_idx = (padded - truncate) // 2 if mode == "same" else 0
    if mode == "same":
        start_idx = (m + n - 1 - truncate) // 2
    return result[..., start_idx : start_idx + truncate]


def repeated_matmul(M, n: int):
    """[M, M^2, ..., M^n] in O(log n) rounds (ref ``:99``)."""
    assert n >= 1
    result = M[None]
    while result.shape[0] < n:
        k = result.shape[0]
        last = result[-1]
        extra = jnp.einsum("...ij,k...jl->k...il", last, result)
        result = jnp.concatenate([result, extra], axis=0)
    return result[:n]


import functools


@functools.lru_cache(maxsize=32)
def _dct_matrix(N: int):
    """Orthonormal DCT-II matrix C with dct(x) = x @ C.T.

    A dense matmul maps straight onto the MXU and beats FFT dispatch for
    the moderate sequence lengths used by reparameterizers; entries:
    C[k, n] = s_k cos(pi (2n+1) k / (2N)).
    """
    import numpy as np

    k = np.arange(N)[:, None]
    n = np.arange(N)[None, :]
    C = np.cos(math.pi * (2 * n + 1) * k / (2 * N))
    C *= math.sqrt(2.0 / N)
    C[0] *= math.sqrt(0.5)
    return jnp.asarray(C, jnp.result_type(float))


def dct(x, dim: int = -1):
    """Orthonormal DCT-II (ref ``tensor_utils.py:dct``)."""
    if dim != -1:
        x = jnp.moveaxis(x, dim, -1)
    C = _dct_matrix(x.shape[-1])
    X = x @ C.T
    if dim != -1:
        X = jnp.moveaxis(X, -1, dim)
    return X


def idct(x, dim: int = -1):
    """Orthonormal DCT-III, the inverse of :func:`dct`
    (ref ``tensor_utils.py:idct``)."""
    if dim != -1:
        x = jnp.moveaxis(x, dim, -1)
    C = _dct_matrix(x.shape[-1])
    out = x @ C
    if dim != -1:
        out = jnp.moveaxis(out, -1, dim)
    return out


def haar_transform(x):
    """Orthonormal discrete Haar transform along dim -1 (ref ``:199``)."""
    n = x.shape[-1] // 2
    even = x[..., 0 : 2 * n : 2]
    odd = x[..., 1 : 2 * n : 2]
    a = (even + odd) * 0.5**0.5
    b = (even - odd) * 0.5**0.5
    if 2 * n < x.shape[-1]:
        a = jnp.concatenate([a, x[..., -1:]], axis=-1)
    if n >= 2:
        a = haar_transform(a)
    return jnp.concatenate([a, b], axis=-1)


def inverse_haar_transform(x):
    """Inverse of :func:`haar_transform` (ref ``:221``)."""
    full = x.shape[-1]
    n = full // 2
    rest_len = full - n
    a = x[..., :rest_len]
    b = x[..., rest_len:]
    if n >= 2:
        a = inverse_haar_transform(a)
    if rest_len > n:
        tail = a[..., n:]
        a = a[..., :n]
    else:
        tail = None
    even = (a + b) * 0.5**0.5
    odd = (a - b) * 0.5**0.5
    out = jnp.stack([even, odd], axis=-1).reshape(
        x.shape[:-1] + (2 * n,)
    )
    if tail is not None:
        out = jnp.concatenate([out, tail], axis=-1)
    return out


def safe_cholesky(x, jitter: float = 1e-6):
    """Cholesky with diagonal jitter on failure risk (ref ``:252``)."""
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    return jnp.linalg.cholesky(x + jitter * eye)


def cholesky_solve(y, L):
    from jax.scipy.linalg import solve_triangular

    z = solve_triangular(L, y, lower=True)
    return solve_triangular(jnp.swapaxes(L, -1, -2), z, lower=False)


def precision_to_scale_tril(P):
    """Ref ``:270`` / torch.distributions.multivariate_normal."""
    Lf = jnp.linalg.cholesky(jnp.flip(P, (-2, -1)))
    L_inv = jnp.swapaxes(jnp.flip(Lf, (-2, -1)), -2, -1)
    eye = jnp.eye(P.shape[-1], dtype=P.dtype)
    from jax.scipy.linalg import solve_triangular

    return solve_triangular(L_inv, eye, lower=True)


def periodic_repeat(x, size: int, dim: int):
    """Tile along dim up to size (ref ``:300``)."""
    assert dim < 0
    reps = [1] * x.ndim
    reps[dim] = -(-size // x.shape[dim])
    result = jnp.tile(x, reps)
    idx = [slice(None)] * x.ndim
    idx[dim] = slice(0, size)
    return result[tuple(idx)]


def periodic_cumsum(x, period: int, dim: int):
    """Cumulative sum with a fixed period (ref ``:318``)."""
    assert dim < 0
    size = x.shape[dim]
    repeats = (size + period - 1) // period
    padded_size = repeats * period
    pad = [(0, 0)] * x.ndim
    pad[x.ndim + dim] = (0, padded_size - size)
    padded = jnp.pad(x, pad)
    shape = (
        x.shape[: x.ndim + dim]
        + (repeats, period)
        + x.shape[x.ndim + dim + 1 :]
    )
    reshaped = padded.reshape(shape)
    summed = jnp.cumsum(reshaped, axis=x.ndim + dim)
    out = summed.reshape(
        x.shape[: x.ndim + dim] + (padded_size,) + x.shape[x.ndim + dim + 1 :]
    )
    idx = [slice(None)] * x.ndim
    idx[x.ndim + dim] = slice(0, size)
    return out[tuple(idx)]


def periodic_features(duration: int, max_period=None, min_period=None, **kwargs):
    """Fourier feature matrix (ref ``:344``)."""
    if max_period is None:
        max_period = duration
    if min_period is None:
        min_period = 2
    t = jnp.arange(duration, dtype=jnp.result_type(float))[:, None]
    periods = []
    p = max_period
    while p >= min_period:
        periods.append(p)
        p = p / 2
    cols = []
    for p in periods:
        cols.append(jnp.cos(2 * math.pi * t / p))
        cols.append(jnp.sin(2 * math.pi * t / p))
    return jnp.concatenate(cols, axis=-1)


def as_complex(x):
    """View the trailing size-2 dim of ``x`` as complex
    (ref ``tensor_utils.py:21``; jax arrays have no stride issues)."""
    return jax.lax.complex(x[..., 0], x[..., 1])


def matmul(x, y):
    """Batched matmul with a fast path for 1x1 (ref :427)."""
    if x.shape[-1] == 1:
        return x * y
    return x @ y


def matvecmul(x, y):
    """Batched matrix-vector product with a 1x1 fast path (ref :433)."""
    if x.shape[-1] == 1:
        return x[..., 0] * y
    return (x @ y[..., None])[..., 0]


def triangular_solve(x, y, upper: bool = False, transpose: bool = False):
    """Solve ``y @ out = x`` for triangular y (ref :439)."""
    if y.shape[-1] == 1:
        return x / y
    if transpose:
        y = jnp.swapaxes(y, -1, -2)
        upper = not upper
    y_b = jnp.broadcast_to(y, jnp.broadcast_shapes(y.shape[:-2], x.shape[:-2]) + y.shape[-2:])
    x_b = jnp.broadcast_to(x, jnp.broadcast_shapes(y.shape[:-2], x.shape[:-2]) + x.shape[-2:])
    return jax.scipy.linalg.solve_triangular(y_b, x_b, lower=not upper)


def safe_normalize(x, *, p: float = 2):
    """Project onto the p-sphere, mapping zero to [1, 0, ..., 0]
    (ref :457)."""
    assert p >= 0
    norm = jnp.linalg.norm(x, ord=p, axis=-1, keepdims=True)
    x = x / jnp.clip(norm, jnp.finfo(x.dtype).tiny)
    default = jnp.zeros_like(x).at[..., 0].set(1.0)
    return jnp.where(norm > 0, x, default)


def broadcast_tensors_without_dim(tensors, dim: int):
    """Broadcast to a common shape leaving dimension ``dim`` of each
    tensor unchanged, so results concatenate along ``dim`` (ref :475)."""
    shapes = [list(t.shape) for t in tensors]
    for s in shapes:
        s[dim] = 1
    common = jnp.broadcast_shapes(*[tuple(s) for s in shapes])
    out = []
    for t in tensors:
        target = list(common)
        target[dim if dim >= 0 else dim + len(common)] = t.shape[dim]
        out.append(jnp.broadcast_to(t, tuple(target)))
    return out
