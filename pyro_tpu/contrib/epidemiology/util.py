"""Quantization helpers for enumerated compartmental inference.

Ref ``pyro/contrib/epidemiology/util.py``: spline-based randomized
quantization (``compute_bin_probs:174``, ``quantize:340``,
``quantize_enumerate:363``) used by the asymptotically exact
``fit_mcmc(num_quant_bins>1)`` mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist


def compute_bin_probs(s, num_quant_bins: int):
    """Categorical probabilities of the quantization scheme
    (ref ``util.py:174``): ``s`` in [0, 1], returns shape
    ``s.shape + (num_quant_bins,)``."""
    t = 1 - s
    if num_quant_bins == 2:
        return jnp.stack([t, s], -1)
    ss = s * s
    tt = t * t
    if num_quant_bins == 4:
        # cubic spline over the nearest four integers -> piecewise
        # quadratic gradients (ref :190-202)
        return (
            jnp.stack(
                [t * tt, 4 + ss * (3 * s - 6), 4 + tt * (3 * t - 6), s * ss],
                -1,
            )
            / 6.0
        )
    if num_quant_bins == 8:
        # quintic spline over the nearest eight integers -> piecewise
        # quartic gradients (ref :204-228)
        s3 = ss * s
        s4 = ss * ss
        s5 = s3 * ss
        t3 = tt * t
        t4 = tt * tt
        t5 = t3 * tt
        probs = jnp.stack(
            [
                2 * t5,
                2 + 10 * t + 20 * tt + 20 * t3 + 10 * t4 - 7 * t5,
                55 + 115 * t + 70 * tt - 9 * t3 - 25 * t4 + 7 * t5,
                302 - 100 * ss + 10 * s4,
                302 - 100 * tt + 10 * t4,
                55 + 115 * s + 70 * ss - 9 * s3 - 25 * s4 + 7 * s5,
                2 + 10 * s + 20 * ss + 20 * s3 + 10 * s4 - 7 * s5,
                2 * s5,
            ],
            -1,
        ) * (1.0 / 840.0)
        return probs
    raise NotImplementedError(
        f"num_quant_bins must be one of 1, 2, 4, 8; got {num_quant_bins}"
    )


def quantize(name, x_real, min, max, num_quant_bins: int = 4):
    """Randomly quantize, preserving probability mass (ref ``util.py:340``)."""
    if num_quant_bins == 1:
        x = jnp.round(jax.lax.stop_gradient(x_real))
        return pyro.deterministic(name, x)
    lb = jnp.floor(jax.lax.stop_gradient(x_real))
    probs = compute_bin_probs(x_real - lb, num_quant_bins)
    q = pyro.sample(
        "Q_" + name,
        dist.Categorical(probs),
        infer={"enumerate": "parallel"},
    )
    q = q.astype(x_real.dtype) - (num_quant_bins // 2 - 1)
    x = lb + q
    x = jnp.maximum(x, 2 * min - 1 - x)
    x = jnp.minimum(x, 2 * max + 1 - x)
    return pyro.deterministic(name, x)


def quantize_enumerate(x_real, min, max, num_quant_bins: int = 4):
    """Quantize, then manually enumerate over the nearest integers
    (ref ``util.py:363``): returns (values, logits) with a trailing
    quantization axis of size ``num_quant_bins``."""
    lb = jnp.floor(jax.lax.stop_gradient(x_real))
    probs = compute_bin_probs(x_real - lb, num_quant_bins)
    logits = jnp.log(jnp.clip(probs, jnp.finfo(probs.dtype).tiny))
    arange_min = 1 - num_quant_bins // 2
    arange_max = 1 + num_quant_bins // 2
    q = jnp.arange(arange_min, arange_max)
    x = lb[..., None] + q
    x = jnp.maximum(x, 2 * jnp.asarray(min)[..., None] - 1 - x)
    x = jnp.minimum(x, 2 * jnp.asarray(max)[..., None] + 1 - x)
    return x, logits
