"""Numerically-stable log-space matmul — the enumeration engine's hot op
(SURVEY §2.8 P3): ``logmatmulexp(x, y)[..., a, c] =
logsumexp_b(x[..., a, b] + y[..., b, c])``, ridden onto the MXU as a
regular matmul of max-shifted exponentials.

Design position — why there is NO hand-written (Pallas) kernel here:
a fused, gridded Pallas TPU kernel for this op was built and measured
on TPU v5e against this XLA formulation at the shapes the discrete-HMM
benches actually produce.  Scan-chained on-device timing (30 calls per
jit, host-read sync):

    (2048, 256, 256) f32:  XLA 4.02 ms (17.1 TF/s)  Pallas 4.96 ms  -> 0.81x
    (16, 512, 512)  f32:   XLA 0.95 ms              Pallas 0.96 ms  -> 0.98x

The (2048, 256, 256) case moves 1.6 GB of HBM traffic, so its ~820 GB/s
roofline is ~2 ms: XLA's own fusion already runs at ~half the bandwidth
bound including the exp/log VPU work, and the hand kernel is *slower*
(Mosaic pipelining beat by XLA's scheduler).  The op is HBM-bound, not
fusion-starved — a hand kernel has no headroom.  XLA wins everywhere we
measured; the kernel was deleted (round-3 verdict item 4).

What *is* kept is the analytic custom VJP: the default autodiff of the
shifted-exp formulation saves the exp'd operands for the backward pass,
while the analytic rule recomputes them from the (bounded) shifts —
less live memory across the forward, same math
(ref ``pyro/ops/special.py:safe_log`` / the adjoint trick in
``pyro/ops/einsum/torch_log.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _logmatmulexp_raw(x, y):
    xs = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    ys = jax.lax.stop_gradient(jnp.max(y, axis=-2, keepdims=True))
    xs = jnp.where(jnp.isfinite(xs), xs, 0.0)
    ys = jnp.where(jnp.isfinite(ys), ys, 0.0)
    z = jnp.einsum(
        "...ik,...kj->...ij", jnp.exp(x - xs), jnp.exp(y - ys)
    )
    return jnp.log(jnp.clip(z, jnp.finfo(z.dtype).tiny)) + xs + ys


@jax.custom_vjp
def logmatmulexp(x, y):
    """log(exp(x) @ exp(y)) with max-shift stabilization and an analytic
    VJP; batched dims broadcast like ``jnp.matmul``."""
    return _logmatmulexp_raw(x, y)


def _fwd(x, y):
    out = _logmatmulexp_raw(x, y)
    return out, (x, y, out)


def _bwd(res, g):
    # The true adjoints are softmax-weighted sums with weights in [0, 1]
    # (out >= x + y pointwise, since out log-sums over the inner dim):
    #   dx[i,k] = sum_j g[i,j] * exp(x[i,k] + y[k,j] - out[i,j])
    #   dy[k,j] = sum_i g[i,j] * exp(x[i,k] + y[k,j] - out[i,j])
    # The naive factoring P * ((g/Z) @ Q^T) overflows when any Z = P@Q
    # underflows (peaked alphas x near-zero transition probs after ~40
    # MAP steps on TPU, where bf16-input matmuls flush f32 denormals):
    # g/Z hits exp(-log tiny) ~ 8.5e37, the matmul sums to inf, and
    # P=0 rows turn it into 0*inf = NaN.  Instead re-shift g/Z by its
    # row max (for dx) / column max (for dy) so the MXU matmul stays
    # bounded by |g|, and recombine the outer exp factors in
    # log-magnitude space, where the exponent only ever reaches the
    # (bounded) final value.
    x, y, out = res
    xs = jnp.max(x, -1, keepdims=True)
    xs = jnp.where(jnp.isfinite(xs), xs, 0.0)
    ys = jnp.max(y, -2, keepdims=True)
    ys = jnp.where(jnp.isfinite(ys), ys, 0.0)
    P = jnp.exp(x - xs)
    Q = jnp.exp(y - ys)
    E = -(out - xs - ys)  # -log Z, in [-log S, -log tiny]
    tiny = jnp.finfo(out.dtype).tiny

    # reduce broadcasted batch dims back to the operand shapes
    def unbroadcast(d, shape):
        extra = d.ndim - len(shape)
        if extra:
            d = d.sum(axis=tuple(range(extra)))
        axes = tuple(
            i for i, (a, b) in enumerate(zip(d.shape, shape)) if a != b
        )
        return d.sum(axis=axes, keepdims=True) if axes else d

    cr = jnp.max(E, -1, keepdims=True)  # per-row shift for dx
    rx = jnp.einsum("...ij,...kj->...ik", g * jnp.exp(E - cr), Q)
    dx = jnp.sign(rx) * jnp.exp(
        (x - xs + cr) + jnp.log(jnp.abs(rx) + tiny)
    )

    y_lead = y.shape[:-2]
    x_lead_n = 1
    for d in x.shape[:-2]:
        x_lead_n *= d
    if all(d == 1 for d in y_lead) and x_lead_n * x.shape[-2] > 1:
        # y is shared across x's batch: the generic path below builds
        # per-batch (i, j) outer products on the VPU and sums them in
        # `unbroadcast` — fold ALL leading dims (batch + rows) into the
        # contraction instead, so dy is ONE (i, N) @ (N, j) MXU matmul.
        # A single global per-column shift is correct here because the
        # batch items are summed anyway: entries that underflow under
        # the global max are exactly the negligible contributions.
        cc = jnp.max(E, axis=tuple(range(E.ndim - 1)), keepdims=True)
        cc = jnp.where(jnp.isfinite(cc), cc, 0.0)
        Gf = (g * jnp.exp(E - cc)).reshape(-1, g.shape[-1])
        Pf = jnp.broadcast_to(P, g.shape[:-1] + P.shape[-1:]).reshape(
            -1, P.shape[-1]
        )
        ry = Pf.T @ Gf
        dy = jnp.sign(ry) * jnp.exp(
            (y.reshape(y.shape[-2:]) - ys.reshape(ys.shape[-2:]) + cc.reshape(1, -1))
            + jnp.log(jnp.abs(ry) + tiny)
        ).reshape(y.shape)
        return unbroadcast(dx, x.shape), dy
    cc = jnp.max(E, -2, keepdims=True)  # per-column shift for dy
    ry = jnp.einsum("...ki,...kj->...ij", P, g * jnp.exp(E - cc))
    dy = jnp.sign(ry) * jnp.exp(
        (y - ys + cc) + jnp.log(jnp.abs(ry) + tiny)
    )
    return unbroadcast(dx, x.shape), unbroadcast(dy, y.shape)


logmatmulexp.defvjp(_fwd, _bwd)


def sequential_logmatmulexp_timemajor(logits):
    """Reduce a (T, ..., S, S) chain of log transition factors to one
    (..., S, S) factor in ceil(log2 T) halving rounds of batched MXU
    log-matmuls (ref ``pyro/ops/...`` ``_sequential_logmatmulexp``,
    ``hmm.py:14``).

    TIME-MAJOR layout: pairing reshapes and odd-tail slices act on the
    leading axis, which XLA lowers to contiguous block DMAs; the same
    halving with time at axis -3 was measured 45% slower on v5e because
    the pair split becomes a strided copy near the minor (lane) dims.
    """
    while logits.shape[0] > 1:
        t = logits.shape[0]
        even = t // 2 * 2
        pairs = logits[:even].reshape((t // 2, 2) + logits.shape[1:])
        contracted = logmatmulexp(pairs[:, 0], pairs[:, 1])
        if t > even:
            contracted = jnp.concatenate(
                [contracted, logits[even:]], axis=0
            )
        logits = contracted
    return logits[0]
