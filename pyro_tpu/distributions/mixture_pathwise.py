"""Pathwise (reparameterized) gradients for Gaussian mixture samples.

JAX ``custom_vjp`` ports of the reference's custom autograd Functions:

- ``_MixDiagNormalSample``          (ref ``diag_normal_mixture.py:134-246``)
- ``_MixDiagNormalSharedCovarianceSample``
                        (ref ``diag_normal_mixture_shared_cov.py:136-204``)
- ``_GSMSample``                    (ref ``gaussian_scale_mixture.py:121-204``)

The estimator is the pathwise derivative for mixture distributions from
Jankowiak & Karaletsos, "Pathwise Derivatives for Multivariate
Distributions" (arXiv:1806.01856): the sample ``z`` is drawn by picking a
component and reparameterizing its Gaussian, and the *backward* pass
supplies the influence-function cotangents for the component ``locs`` /
``scales`` / mixture ``logits`` — an unbiased, low-variance alternative to
score-function gradients.  No gradient flows through the component index
or the white noise (they are treated as non-differentiable randomness,
exactly as in the reference).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf

_LOG_2PI = math.log(2.0 * math.pi)
_ROOT_TWO = math.sqrt(2.0)


def _sum_leftmost(x, count):
    """Sum the leading ``count`` dims (negative: all but the last
    ``-count``); ref ``pyro/distributions/util.py`` ``sum_leftmost``."""
    if count < 0:
        count = jnp.ndim(x) + count
    if count == 0:
        return x
    return x.sum(axis=tuple(range(count)))


def _float0_like(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _gather_component(params, which):
    """params: (*b, K, D); which: (*l, *b) int -> (*l, *b, D)."""
    lb = jnp.shape(which)
    K, D = params.shape[-2:]
    params = jnp.broadcast_to(params, lb + (K, D))
    idx = which[..., None, None].astype(jnp.int32)
    return jnp.take_along_axis(params, jnp.broadcast_to(idx, lb + (1, D)), axis=-2)[
        ..., 0, :
    ]


# =====================================================================
# MixtureOfDiagNormals
# =====================================================================


@jax.custom_vjp
def mix_diag_normal_sample(locs, coord_scale, component_logits, pis, which, white):
    loc = _gather_component(locs, which)
    sigma = _gather_component(coord_scale, which)
    return loc + sigma * white


def _mdn_fwd(locs, coord_scale, component_logits, pis, which, white):
    z = mix_diag_normal_sample(locs, coord_scale, component_logits, pis, which, white)
    return z, (z, coord_scale, locs, pis, which, white)


def _mdn_bwd(res, g):
    # ref diag_normal_mixture.py:149-246 (_MixDiagNormalSample.backward)
    z, scales, locs, pis, which, white = res
    dim = scales.shape[-1]
    K = pis.shape[-1]
    batch_dims = locs.ndim - 2
    g = g[..., None, :]  # l b 1 i

    locs_tilde = locs / scales  # b j i
    sigma_0 = jnp.min(scales, axis=-2, keepdims=True)  # b 1 i
    z_shift = (z[..., None, :] - locs) / sigma_0  # l b j i
    z_tilde = z[..., None, :] / scales - locs_tilde  # l b j i

    mu_cd = locs[..., :, None, :] - locs[..., None, :, :]  # b c d i
    mu_cd_norm = jnp.sqrt((mu_cd**2).sum(-1))  # b c d
    eye = jnp.eye(K, dtype=bool)
    mu_cd = jnp.where(
        eye[..., None],
        0.0,
        mu_cd / jnp.where(eye, 1.0, mu_cd_norm)[..., None],
    )

    mu_ll_cd = (locs[..., :, None, :] * mu_cd).sum(-1)  # b c d
    z_ll_cd = (z[..., None, None, :] * mu_cd).sum(-1)  # l b c d
    z_perp_cd = z[..., None, None, :] - z_ll_cd[..., None] * mu_cd  # l b c d i
    z_perp_cd_sqr = (z_perp_cd**2).sum(-1)  # l b c d

    shift_idx = np.maximum(np.arange(dim) - 1, 0)  # [0, 0, 1, ..., dim-2]

    z_shift_sqr = z_shift**2
    z_shift_cumsum = z_shift_sqr.sum(-1, keepdims=True) - jnp.cumsum(
        z_shift_sqr, axis=-1
    )  # l b j i
    z_tilde_cumsum = jnp.cumsum(z_tilde**2, axis=-1)[..., shift_idx]
    z_tilde_cumsum = z_tilde_cumsum.at[..., 0].set(0.0)
    r_sqr_ji = z_shift_cumsum + z_tilde_cumsum  # l b j i

    log_scales = jnp.log(scales)  # b j i
    log_qs = -0.5 * z_tilde**2 - 0.5 * _LOG_2PI - log_scales  # l b j i
    log_q_j = log_qs.sum(-1, keepdims=True)  # l b j 1
    q_j = jnp.exp(log_q_j)  # l b j 1
    q_tot = (pis * q_j[..., 0]).sum(-1)[..., None]  # l b 1

    shift_log_scales = log_scales[..., shift_idx].at[..., 0].set(0.0)
    sigma_products = jnp.exp(jnp.cumsum(shift_log_scales, axis=-1))  # b j i

    rev = np.arange(dim - 1, -1, -1)
    reverse_log_sigma_0 = jnp.log(sigma_0)[..., rev]  # b 1 i
    sigma_0_products = jnp.exp(jnp.cumsum(reverse_log_sigma_0, axis=-1))[
        ..., (rev - 1) % dim
    ]
    sigma_0_products = sigma_0_products.at[..., -1].set(1.0)
    sigma_products = sigma_products * sigma_0_products

    logits_grad = erf(z_tilde / _ROOT_TWO) - erf(z_shift / _ROOT_TWO)  # l b j i
    logits_grad = logits_grad * jnp.exp(-0.5 * r_sqr_ji)
    logits_grad = (logits_grad * g / sigma_products).sum(-1)  # l b j
    logits_grad = _sum_leftmost(logits_grad / q_tot, -1 - batch_dims)  # b j
    logits_grad = logits_grad * (0.5 * (2.0 * math.pi) ** (-0.5 * (dim - 1)))
    logits_grad = -pis * logits_grad
    logits_grad = logits_grad - logits_grad.sum(-1, keepdims=True) * pis

    mu_ll_dc = jnp.swapaxes(mu_ll_cd, -1, -2)
    v_cd = erf((z_ll_cd - mu_ll_cd) / _ROOT_TWO) - erf(
        (z_ll_cd + mu_ll_dc) / _ROOT_TWO
    )
    v_cd = v_cd * jnp.exp(-0.5 * z_perp_cd_sqr)  # l b c d
    mu_cd_g = (g[..., None, :] * mu_cd).sum(-1)  # l b c d
    v_cd = v_cd * (
        -mu_cd_g
        * pis[..., None, :]
        * (0.5 * (2.0 * math.pi) ** (-0.5 * (dim - 1)))
    )
    v_cd = pis * _sum_leftmost(v_cd.sum(-1) / q_tot, -1 - batch_dims)
    logits_grad = logits_grad + v_cd

    prefactor = pis[..., None] * q_j * g / q_tot[..., None]  # l b j i
    locs_grad = _sum_leftmost(prefactor, -2 - batch_dims)
    scales_grad = _sum_leftmost(prefactor * z_tilde, -2 - batch_dims)

    return (
        locs_grad,
        scales_grad,
        logits_grad,
        jnp.zeros_like(pis),
        _float0_like(which),
        jnp.zeros_like(white),
    )


mix_diag_normal_sample.defvjp(_mdn_fwd, _mdn_bwd)


# =====================================================================
# MixtureOfDiagNormalsSharedCovariance
# =====================================================================


@jax.custom_vjp
def mix_diag_normal_shared_cov_sample(
    locs, coord_scale, component_logits, pis, which, white
):
    loc = _gather_component(locs, which)
    return loc + coord_scale * white


def _mdnsc_fwd(locs, coord_scale, component_logits, pis, which, white):
    z = mix_diag_normal_shared_cov_sample(
        locs, coord_scale, component_logits, pis, which, white
    )
    return z, (z, coord_scale, locs, pis, which, white)


def _mdnsc_bwd(res, g):
    # ref diag_normal_mixture_shared_cov.py:152-204
    z, coord_scale, locs, pis, which, white = res
    K = pis.shape[-1]
    batch_dims = coord_scale.ndim - 1

    z_tilde = z / coord_scale  # l b i
    locs_tilde = locs / coord_scale[..., None, :]  # b j i
    mu_ab = locs_tilde[..., :, None, :] - locs_tilde[..., None, :, :]  # b k j i
    mu_ab_norm = jnp.sqrt((mu_ab**2).sum(-1))  # b k j
    eye = jnp.eye(K, dtype=bool)
    mu_ab = jnp.where(
        eye[..., None],
        0.0,
        mu_ab / jnp.where(eye, 1.0, mu_ab_norm)[..., None],
    )

    mu_ll_ab = (locs_tilde[..., :, None, :] * mu_ab).sum(-1)  # b k j
    z_ll_ab = (z_tilde[..., None, None, :] * mu_ab).sum(-1)  # l b k j
    z_perp_ab = (
        z_tilde[..., None, None, :] - z_ll_ab[..., None] * mu_ab
    )  # l b k j i
    z_perp_ab_sqr = (z_perp_ab**2).sum(-1)  # l b k j

    epsilons = z_tilde[..., None, :] - locs_tilde  # l b j i
    log_q_j = (-0.5 * epsilons**2).sum(-1, keepdims=True)  # l b j 1
    log_q_j_max = jnp.max(log_q_j, axis=-2, keepdims=True)
    q_j_prime = jnp.exp(log_q_j - log_q_j_max)  # l b j 1
    q_j = jnp.exp(log_q_j)  # l b j 1

    q_tot = (pis[..., None] * q_j).sum(-2)  # l b 1
    q_tot_prime = (pis[..., None] * q_j_prime).sum(-2)[..., None]  # l b 1 1

    mu_ll_ba = jnp.swapaxes(mu_ll_ab, -1, -2)
    logits_grad = erf((z_ll_ab - mu_ll_ab) / _ROOT_TWO) - erf(
        (z_ll_ab + mu_ll_ba) / _ROOT_TWO
    )
    logits_grad = logits_grad * jnp.exp(-0.5 * z_perp_ab_sqr)  # l b k j

    mu_ab_sigma_g = (
        (coord_scale * g)[..., None, None, :] * mu_ab
    ).sum(-1)  # l b k j
    logits_grad = logits_grad * (-mu_ab_sigma_g * pis[..., None, :])
    logits_grad = pis * _sum_leftmost(
        logits_grad.sum(-1) / q_tot, -(1 + batch_dims)
    )  # b k
    logits_grad = logits_grad * math.sqrt(0.5 * math.pi)

    prefactor = (
        pis[..., None] * q_j_prime * g[..., None, :] / q_tot_prime
    )  # l b j i
    locs_grad = _sum_leftmost(prefactor, -(2 + batch_dims))  # b j i
    coord_scale_grad = _sum_leftmost(
        prefactor * epsilons, -(2 + batch_dims)
    ).sum(-2)  # b i

    return (
        locs_grad,
        coord_scale_grad,
        logits_grad,
        jnp.zeros_like(pis),
        _float0_like(which),
        jnp.zeros_like(white),
    )


mix_diag_normal_shared_cov_sample.defvjp(_mdnsc_fwd, _mdnsc_bwd)


# =====================================================================
# GaussianScaleMixture
# =====================================================================


def gsm_coeffs(dim: int) -> np.ndarray:
    """ref gaussian_scale_mixture.py:83-91 (_compute_coeffs)."""
    dimov2 = dim // 2
    coeffs = np.ones(dimov2)
    for k in range(dimov2 - 1):
        coeffs[k + 1 :] *= dim - 2 * (k + 1)
    return coeffs


@jax.custom_vjp
def gsm_sample(coord_scale, component_logits, component_scale, pis, which, white):
    which_scale = component_scale[which][..., None]
    return coord_scale * which_scale * white


def _gsm_fwd(coord_scale, component_logits, component_scale, pis, which, white):
    z = gsm_sample(coord_scale, component_logits, component_scale, pis, which, white)
    return z, (z, coord_scale, component_scale, pis, which, white)


def _gsm_bwd(res, g):
    # ref gaussian_scale_mixture.py:138-204 (_GSMSample.backward)
    z, coord_scale, component_scale, pis, which, white = res
    dim = coord_scale.shape[0]
    coeffs = jnp.asarray(gsm_coeffs(dim), z.dtype)
    g = g[..., None, :]  # l 1 i

    component_scale_sqr = component_scale**2  # j
    epsilons = z / coord_scale  # l i
    r_sqr = (epsilons**2).sum(-1, keepdims=True)  # l 1
    r_sqr_j = r_sqr / component_scale_sqr  # l j
    coord_scale_product = coord_scale.prod()
    component_scale_power = component_scale**float(dim)

    q_j = jnp.exp(-0.5 * r_sqr_j) / (2.0 * math.pi) ** (0.5 * dim)  # l j
    q_j = q_j / (coord_scale_product * component_scale_power)
    q_tot = (pis * q_j).sum(-1, keepdims=True)  # l 1

    Phi_j = jnp.exp(-0.5 * r_sqr_j)  # l j
    exponents = -jnp.arange(1.0, dim // 2 + 1.0, 1.0)
    r_j_poly = coeffs * r_sqr_j[..., None] ** exponents  # l j d/2
    Phi_j = Phi_j * r_j_poly.sum(-1)
    if dim % 2 == 1:
        extra = (
            coeffs[-1]
            * math.sqrt(0.5 * math.pi)
            * (1.0 - erf(jnp.sqrt(r_sqr_j) / _ROOT_TWO))
        )
        Phi_j = Phi_j + extra * r_sqr_j ** (-0.5 * dim)

    logits_grad = (z[..., None, :] * Phi_j[..., None] * g).sum(-1)  # l j
    logits_grad = logits_grad / q_tot
    logits_grad = _sum_leftmost(logits_grad, -1) * (2.0 * math.pi) ** (
        -0.5 * dim
    )
    logits_grad = (
        pis * logits_grad / (component_scale_power * coord_scale_product)
    )
    logits_grad = logits_grad - logits_grad.sum() * pis

    prefactor = pis[..., None] * q_j[..., None] * g / q_tot[..., None]  # l j i
    coord_scale_grad = _sum_leftmost(prefactor * epsilons[..., None, :], -1)
    component_scale_grad = _sum_leftmost(
        (prefactor * z[..., None, :]).sum(-1) / component_scale, -1
    )

    return (
        coord_scale_grad,
        logits_grad,
        component_scale_grad,
        jnp.zeros_like(pis),
        _float0_like(which),
        jnp.zeros_like(white),
    )


gsm_sample.defvjp(_gsm_fwd, _gsm_bwd)
