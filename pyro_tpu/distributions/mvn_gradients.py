"""OMT and AVF gradient estimators for multivariate-normal samples.

JAX ``custom_vjp`` ports of the reference's custom autograd Functions:

- ``_OMTMVNSample`` (ref ``omt_mvn.py:43-90``): the optimal-mass-transport
  pathwise gradient of Jankowiak & Karaletsos (arXiv:1806.01856) — same
  expectation as the standard reparameterized gradient, generally lower
  variance, O(D^3) per backward via an SVD of the precision matrix.
- ``_AVFMVNSample`` (ref ``avf_mvn.py:70-106``): adaptive-velocity-field
  control variates — the standard reparameterized Cholesky gradient plus a
  learnable infinitesimal-rotation control variate parameterized by a
  ``(2, L, D)`` tensor that receives its own adaptation gradient.

No gradient flows through the white noise (non-differentiable randomness,
as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def _sum_leftmost(x, count):
    if count < 0:
        count = jnp.ndim(x) + count
    if count == 0:
        return x
    return x.sum(axis=tuple(range(count)))


def _unbroadcast(g, shape):
    """Reduce a gradient to the (possibly broadcast) primal shape, so a
    batched ``loc`` (from ``Distribution.expand``) gets a matching grad."""
    extra = g.ndim - len(shape)
    if extra:
        g = g.sum(axis=tuple(range(extra)))
    keep = tuple(i for i, s in enumerate(shape) if s == 1 and g.shape[i] != 1)
    if keep:
        g = g.sum(axis=keep, keepdims=True)
    return g


@jax.custom_vjp
def omt_mvn_sample(loc, scale_tril, white):
    """z = loc + white @ L.T with the OMT backward for (loc, L)."""
    return loc + white @ scale_tril.T


def _omt_fwd(loc, scale_tril, white):
    z = white @ scale_tril.T
    return loc + z, (z, white, scale_tril, loc)


def _omt_bwd(res, g):
    # ref omt_mvn.py:51-90 (_OMTMVNSample.backward)
    jitter = 1.0e-8
    z, epsilon, L, loc_res = res
    dim = L.shape[0]
    loc_grad = _unbroadcast(g, loc_res.shape)

    identity = jnp.eye(dim, dtype=L.dtype)
    R_inv = solve_triangular(L.T, identity, lower=False)

    z_ja = z[..., None]
    g_R_inv = (g @ R_inv)[..., None, :]
    epsilon_jb = epsilon[..., None, :]
    g_ja = g[..., None]
    diff_L_ab = 0.5 * _sum_leftmost(g_ja * epsilon_jb + g_R_inv * z_ja, -2)

    Sigma_inv = R_inv @ R_inv.T
    V, D, _ = jnp.linalg.svd(Sigma_inv + jitter)
    D_outer = D[:, None] + D[None, :]

    z_tilde = identity * (z @ V)[..., None]
    g_tilde = identity * (g @ V)[..., None]

    Y = _sum_leftmost(z_tilde @ ((1.0 / D_outer) @ g_tilde), -2)
    Y = V @ (Y @ V.T)
    Y = Y + Y.T

    Tr_xi_Y = (Sigma_inv @ Y) @ R_inv - Y @ (Sigma_inv @ R_inv)
    diff_L_ab = diff_L_ab + 0.5 * Tr_xi_Y
    L_grad = jnp.tril(diff_L_ab)

    return loc_grad, L_grad, jnp.zeros_like(epsilon)


omt_mvn_sample.defvjp(_omt_fwd, _omt_bwd)


@jax.custom_vjp
def avf_mvn_sample(loc, scale_tril, control_var, white):
    """z = loc + white @ L.T with AVF control-variate backward."""
    return loc + white @ scale_tril.T


def _avf_fwd(loc, scale_tril, control_var, white):
    z = loc + white @ scale_tril.T
    return z, (scale_tril, control_var, white, loc)


def _avf_bwd(res, g):
    # ref avf_mvn.py:78-106 (_AVFMVNSample.backward)
    L, control_var, epsilon, loc_res = res
    B, C = control_var[0], control_var[1]
    loc_grad = _unbroadcast(g, loc_res.shape)

    # standard reparameterization-trick gradient
    epsilon_jb = epsilon[..., None, :]
    g_ja = g[..., None]
    diff_L_ab = _sum_leftmost(g_ja * epsilon_jb, -2)

    # modulate the velocity fields with infinitesimal rotations
    gL = g @ L
    eps_gL_ab = _sum_leftmost(gL[..., None] * epsilon[..., None, :], -2)
    xi_ab = eps_gL_ab - eps_gL_ab.T
    BC_lab = B[..., None] * C[..., None, :]
    diff_L_ab = diff_L_ab + (xi_ab[None] * BC_lab).sum(0)
    L_grad = jnp.tril(diff_L_ab)

    # control-variate adaptation gradients
    diff_B = (L_grad[None] * C[:, None, :] * xi_ab[None]).sum(2)
    diff_C = (L_grad.T[None] * B[:, None, :] * xi_ab.T[None]).sum(2)
    diff_CV = jnp.stack([diff_B, diff_C])

    return loc_grad, L_grad, diff_CV, jnp.zeros_like(epsilon)


avf_mvn_sample.defvjp(_avf_fwd, _avf_bwd)
