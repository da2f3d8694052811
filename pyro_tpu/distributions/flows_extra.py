"""Learnable normalizing flows completing the reference catalog.

Ref ``pyro/distributions/transforms/``: ``sylvester.py:14``,
``block_autoregressive.py:29`` (BNAF), ``neural_autoregressive.py:23``
(NAF), ``polynomial.py:17`` (sum-of-squares polynomial flow),
``matrix_exponential.py:19``, ``generalized_channel_permute.py:16``
(Glow 1x1 conv), ``spline_autoregressive.py:18``, ``spline_coupling.py:15``,
and the conditional variants of each.

Design: transforms are pure functions of explicit parameter arrays or
conditioner callables (flax modules bridged through the param store by the
lowercase factories), so they train under the jitted SVI step.  Forward-only
flows (Sylvester, BNAF, NAF, Polynomial) recompute their log-det from ``x``
— no torch-style caching is needed because XLA CSE merges the duplicated
work under ``jit``.
"""

from __future__ import annotations

import math
import zlib
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import constraints
from ..primitives import param as pyro_param
from .conditional import ConditionalTransformModule, ComposeTransformModule
from .flows import (
    AffineAutoregressive,
    AffineCoupling,
    Householder,
    Planar,
    Radial,
    Spline,
)
from .transforms import (
    SigmoidTransform,
    TanhTransform,
    Transform,
)
from .transforms_extra import ELUTransform, LeakyReLUTransform


def _activation_transform(name: str) -> Transform:
    table = {
        "ELU": ELUTransform,
        "LeakyReLU": LeakyReLUTransform,
        "sigmoid": SigmoidTransform,
        "tanh": TanhTransform,
    }
    if name not in table:
        raise ValueError(f'Invalid activation function "{name}"')
    return table[name]()


# =========================================================================
# Sylvester
# =========================================================================


class Sylvester(Transform):
    """Householder-variety Sylvester flow (ref ``sylvester.py:14``;
    van den Berg et al. 2018): y = x + Q R tanh(S Q^T x + b) with R, S
    upper-triangular and Q orthogonal (product of Householder
    reflections).  Forward (sampling) direction only."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    def __init__(self, u_unnormed, R_dense, S_dense, R_diag, S_diag, b):
        super().__init__()
        self.u_unnormed = u_unnormed  # (count_transforms, D) Householder vecs
        self.R_dense = R_dense
        self.S_dense = S_dense
        self.R_diag = R_diag
        self.S_diag = S_diag
        self.b = b

    def _R(self):
        D = self.R_dense.shape[-1]
        mask = jnp.triu(jnp.ones((D, D)), k=1)
        return self.R_dense * mask + jnp.diag(jnp.tanh(self.R_diag))

    def _S(self):
        D = self.S_dense.shape[-1]
        mask = jnp.triu(jnp.ones((D, D)), k=1)
        return self.S_dense * mask + jnp.diag(jnp.tanh(self.S_diag))

    def _Q(self):
        D = self.u_unnormed.shape[-1]
        u = self.u_unnormed / jnp.clip(
            jnp.linalg.norm(self.u_unnormed, axis=-1, keepdims=True), 1e-12
        )

        def body(Q, ui):
            H = jnp.eye(D) - 2.0 * jnp.outer(ui, ui)
            return Q @ H, None

        Q, _ = jax.lax.scan(body, jnp.eye(D), u)
        return Q

    def _forward_and_ladj(self, x):
        Q, R, S = self._Q(), self._R(), self._S()
        A = Q @ R
        B = S @ Q.T
        pre = x @ B.T + self.b
        t = jnp.tanh(pre)
        y = x + t @ A.T
        dtanh = 1.0 - t**2
        ladj = jnp.sum(
            jnp.log1p(
                dtanh * jnp.diagonal(R) * jnp.diagonal(S) + 1e-8
            ),
            axis=-1,
        )
        return y, ladj

    def __call__(self, x):
        y, _ = self._forward_and_ladj(x)
        return y

    def _inverse(self, y):
        raise NotImplementedError(
            "Sylvester flow has no analytic inverse; use it only in the "
            "sampling direction"
        )

    def log_abs_det_jacobian(self, x, y):
        _, ladj = self._forward_and_ladj(x)
        return ladj


# =========================================================================
# Block Neural Autoregressive Flow (BNAF)
# =========================================================================


class _MaskedBlockLinear:
    """Weight-normalized block-lower-triangular linear layer with positive
    diagonal blocks (ref ``block_autoregressive.py:202``)."""

    def __init__(self, name: str, in_features, out_features, dim, key):
        self.dim = dim
        self.in_features = in_features
        self.out_features = out_features
        k1, k2, k3 = jax.random.split(key, 3)

        rows, cols = out_features // dim, in_features // dim
        w0 = np.zeros((out_features, in_features), dtype=np.float32)
        rng = np.random.RandomState(zlib.crc32(name.encode()))
        for i in range(dim):
            blk_cols = (i + 1) * cols
            bound = math.sqrt(6.0 / (rows + blk_cols))
            w0[i * rows : (i + 1) * rows, :blk_cols] = rng.uniform(
                -bound, bound, size=(rows, blk_cols)
            )
        self.weight = pyro_param(f"{name}$$$weight", jnp.asarray(w0))
        self.diag_weight = pyro_param(
            f"{name}$$$diag_weight",
            jnp.log(jax.random.uniform(k2, (out_features, 1))),
        )
        self.bias = pyro_param(
            f"{name}$$$bias",
            jax.random.uniform(
                k3,
                (out_features,),
                minval=-1.0 / math.sqrt(out_features),
                maxval=1.0 / math.sqrt(out_features),
            ),
        )
        eye = np.eye(dim, dtype=np.float32)
        self.mask_d = jnp.asarray(
            np.kron(eye, np.ones((rows, cols), dtype=np.float32))
        )
        self.mask_o = jnp.asarray(
            np.kron(
                np.tril(np.ones((dim, dim), dtype=np.float32), -1),
                np.ones((rows, cols), dtype=np.float32),
            )
        )

    def get_weights(self):
        eps = 1e-8
        w = (
            jnp.exp(self.weight) * self.mask_d
            + self.weight * self.mask_o
        )
        w_norm2 = jnp.sum(w**2, axis=-1, keepdims=True)
        w_wn = jnp.exp(self.diag_weight) * w / (jnp.sqrt(w_norm2) + eps)
        wpl = (
            self.diag_weight
            + self.weight
            - 0.5 * jnp.log(w_norm2 + eps)
        )
        rows, cols = (
            self.out_features // self.dim,
            self.in_features // self.dim,
        )
        wpl_diag = wpl[self.mask_d.astype(bool)].reshape(
            self.dim, rows, cols
        )
        return w_wn, wpl_diag

    def __call__(self, x):
        # x: (..., in_features); returns (y, log-diag-block-jacobian)
        w, wpl = self.get_weights()
        return x @ w.T + self.bias, wpl


def _log_matrix_product(A, B):
    """logsumexp matmul over log-space matrices (ref
    ``block_autoregressive.py:19``): out[..., i, j] =
    LSE_k(A[..., i, k] + B[..., k, j])."""
    return jax.scipy.special.logsumexp(
        A[..., :, :, None] + B[..., None, :, :], axis=-2
    )


class BlockAutoregressive(Transform):
    """Block Neural Autoregressive Flow (ref
    ``block_autoregressive.py:29``; De Cao et al. 2019).  Forward only."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True
    autoregressive = True

    def __init__(
        self,
        name: str,
        input_dim: int,
        hidden_factors: Sequence[int] = (8, 8),
        activation: str = "tanh",
        residual: Optional[str] = None,
    ):
        super().__init__()
        if any(h < 1 for h in hidden_factors):
            raise ValueError(
                f"Hidden factors, {hidden_factors}, must all be >= 1"
            )
        if residual not in (None, "normal", "gated"):
            raise ValueError(
                f'Invalid value {residual} for keyword argument "residual"'
            )
        self.T = _activation_transform(activation)
        self.residual = residual
        self.input_dim = input_dim
        key = jax.random.key(zlib.crc32(name.encode()))
        keys = jax.random.split(key, len(hidden_factors) + 1)
        dims = (
            [input_dim]
            + [input_dim * h for h in hidden_factors]
            + [input_dim]
        )
        self.layers = [
            _MaskedBlockLinear(
                f"{name}$$$layer{i}", dims[i], dims[i + 1], input_dim,
                keys[i],
            )
            for i in range(len(dims) - 1)
        ]
        if residual == "gated":
            self.gate = pyro_param(f"{name}$$$gate", jnp.zeros(()))

    def _act_ladj(self, pre):
        y = self.T(pre)
        return y, self.T.log_abs_det_jacobian(pre, y)

    def _forward_and_ladj(self, x):
        eps = 1e-8
        y = x
        logDetJ = None
        n = len(self.layers)
        for idx, layer in enumerate(self.layers):
            pre, dy_dx = layer(y)
            # dy_dx: (D, rows_out, rows_in) log-diag-block of this layer
            if idx == 0:
                y, j_act = self._act_ladj(pre)
                # activation jacobian per hidden unit, blocked per dim
                j_act = j_act.reshape(
                    x.shape[:-1] + (self.input_dim, -1, 1)
                )
                logDetJ = dy_dx + j_act
            elif idx < n - 1:
                y, j_act = self._act_ladj(pre)
                j_act = j_act.reshape(
                    x.shape[:-1] + (self.input_dim, -1, 1)
                )
                logDetJ = _log_matrix_product(dy_dx, logDetJ) + j_act
            else:
                y = pre
                logDetJ = _log_matrix_product(dy_dx, logDetJ)

        ladj = logDetJ[..., 0, 0]  # (..., D)
        if self.residual == "normal":
            y = y + x
            ladj = jax.nn.softplus(ladj)
        elif self.residual == "gated":
            g = jax.nn.sigmoid(self.gate)
            y = g * x + (1.0 - g) * y
            term1 = jnp.log(g + eps)
            term2 = jax.nn.softplus(
                jnp.log1p(eps - g) - jnp.log(g + eps) + ladj
            )
            ladj = term1 + term2
        return y, jnp.sum(ladj, axis=-1)

    def __call__(self, x):
        y, _ = self._forward_and_ladj(x)
        return y

    def _inverse(self, y):
        raise NotImplementedError(
            "BlockAutoregressive flow has no analytic inverse; use it "
            "only in the sampling direction"
        )

    def log_abs_det_jacobian(self, x, y):
        _, ladj = self._forward_and_ladj(x)
        return ladj

    autoregressive = True


# =========================================================================
# Neural Autoregressive Flow (NAF, "IAF flavour")
# =========================================================================


class NeuralAutoregressive(Transform):
    """Deep sigmoidal-flow NAF (ref ``neural_autoregressive.py:23``;
    Huang et al. 2018).  Forward only."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True
    autoregressive = True
    eps = 1e-8

    def __init__(
        self,
        autoregressive_nn: Callable,
        hidden_units: int = 16,
        activation: str = "sigmoid",
    ):
        super().__init__()
        self.arn = autoregressive_nn
        self.hidden_units = hidden_units
        self.T = _activation_transform(activation)

    def _forward_and_ladj(self, x):
        # A, W_pre, b ~ (..., hidden_units, D)
        A_pre, W_pre, b = self.arn(x)
        T = self.T
        A = jax.nn.softplus(A_pre)
        C = A * x[..., None, :] + b
        W = jax.nn.softmax(W_pre, axis=-2)
        T_C = T(C)
        D = jnp.sum(W * T_C, axis=-2)
        y = T.inv(D)

        log_dydD = T.inv.log_abs_det_jacobian(D, y)
        log_dDdx = jax.scipy.special.logsumexp(
            jnp.log(A + self.eps)
            + jax.nn.log_softmax(W_pre, axis=-2)
            + T.log_abs_det_jacobian(C, T_C),
            axis=-2,
        )
        ladj = jnp.sum(log_dydD + log_dDdx, axis=-1)
        return y, ladj

    def __call__(self, x):
        y, _ = self._forward_and_ladj(x)
        return y

    def _inverse(self, y):
        raise NotImplementedError(
            "NeuralAutoregressive flow has no analytic inverse; use it "
            "only in the sampling direction"
        )

    def log_abs_det_jacobian(self, x, y):
        _, ladj = self._forward_and_ladj(x)
        return ladj

    autoregressive = True


class ConditionalNeuralAutoregressive(ConditionalTransformModule):
    """Ref ``neural_autoregressive.py:144``."""

    def __init__(self, autoregressive_nn, **kwargs):
        self.nn = autoregressive_nn
        self.kwargs = kwargs

    def condition(self, context):
        return NeuralAutoregressive(
            lambda x: self.nn(x, context=context), **self.kwargs
        )


# =========================================================================
# Polynomial (sum-of-squares) flow
# =========================================================================


class Polynomial(Transform):
    """Single-degree sum-of-squares polynomial flow (ref
    ``polynomial.py:17``; Jaini et al. 2019).  Forward only."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True
    autoregressive = True

    def __init__(
        self,
        autoregressive_nn: Callable,
        input_dim: int,
        count_degree: int,
        count_sum: int,
        c=None,
    ):
        super().__init__()
        self.arn = autoregressive_nn
        self.input_dim = input_dim
        self.count_degree = count_degree
        self.count_sum = count_sum
        self.c = jnp.zeros(input_dim) if c is None else c
        powers = jnp.arange(1, count_degree + 2, dtype=jnp.float32)
        # power_mask[i, j] = (i+1) + j for integrated monomial exponents
        self.power_mask = powers + jnp.arange(count_degree + 1)[:, None]
        self.recip_mask = 1.0 / self.power_mask

    def _forward_and_ladj(self, x):
        batch_shape = x.shape[:-1]
        flat = x.reshape(-1, self.input_dim)
        A = self.arn(flat)
        A = A.reshape(
            -1, self.count_sum, self.count_degree + 1, self.input_dim
        )
        coefs = A[..., None, :] * A[..., None, :, :]
        # coefs ~ (B, count_sum, deg+1, deg+1, D)
        x_view = flat.reshape(-1, 1, 1, self.input_dim)
        x_pow = x_view ** self.power_mask[..., None]
        y = self.c + jnp.sum(
            coefs * x_pow[:, None] * self.recip_mask[..., None],
            axis=(1, 2, 3),
        )
        x_pow_d = x_view ** (self.power_mask[..., None] - 1.0)
        ladj = jnp.sum(
            jnp.log(
                jnp.sum(coefs * x_pow_d[:, None], axis=(1, 2, 3)) + 1e-8
            ),
            axis=-1,
        )
        return (
            y.reshape(batch_shape + (self.input_dim,)),
            ladj.reshape(batch_shape),
        )

    def __call__(self, x):
        y, _ = self._forward_and_ladj(x)
        return y

    def _inverse(self, y):
        raise NotImplementedError(
            "Polynomial flow has no analytic inverse; use it only in the "
            "sampling direction"
        )

    def log_abs_det_jacobian(self, x, y):
        _, ladj = self._forward_and_ladj(x)
        return ladj

    autoregressive = True


# =========================================================================
# Matrix exponential
# =========================================================================


class ConditionedMatrixExponential(Transform):
    """y = expm(M) x via power series (ref ``matrix_exponential.py:19``);
    log|det| = trace(M)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    def __init__(
        self,
        weights=None,
        iterations: int = 8,
        normalization: str = "none",
        bound=None,
    ):
        super().__init__()
        assert iterations > 0
        if normalization in ("weight", "spectral"):
            raise NotImplementedError(
                "Normalization is currently not implemented."
            )
        if normalization != "none":
            raise ValueError(
                f"Unknown normalization method: {normalization}"
            )
        self.weights = weights
        self.iterations = iterations
        self.bound = bound

    def _M(self):
        return self.weights() if callable(self.weights) else self.weights

    def _exp(self, x, M):
        y = x
        term = x
        for idx in range(self.iterations):
            term = jnp.squeeze(
                M @ term[..., None], axis=-1
            ) / (idx + 1)
            y = y + term
        return y

    def __call__(self, x):
        return self._exp(x, self._M())

    def _inverse(self, y):
        return self._exp(y, -self._M())

    def log_abs_det_jacobian(self, x, y):
        tr = jnp.trace(self._M(), axis1=-2, axis2=-1)
        return jnp.broadcast_to(tr, x.shape[:-1])


class MatrixExponential(ConditionedMatrixExponential):
    """Learnable matrix-exponential flow (ref
    ``matrix_exponential.py:95``)."""

    def __init__(
        self,
        name: str,
        input_dim: int,
        iterations: int = 8,
        normalization: str = "none",
        bound=None,
    ):
        w = pyro_param(
            f"{name}$$$weights",
            0.01
            * jax.random.normal(
                jax.random.key(zlib.crc32(name.encode())),
                (input_dim, input_dim),
            ),
        )
        super().__init__(
            w, iterations=iterations, normalization=normalization,
            bound=bound,
        )


class ConditionalMatrixExponential(ConditionalTransformModule):
    """Ref ``matrix_exponential.py:168``."""

    def __init__(
        self,
        input_dim: int,
        nn: Callable,
        iterations: int = 8,
        normalization: str = "none",
        bound=None,
    ):
        self.input_dim = input_dim
        self.nn = nn
        self.iterations = iterations
        self.normalization = normalization
        self.bound = bound

    def condition(self, context):
        flat = self.nn(context)
        weights = flat.reshape(
            flat.shape[:-1] + (self.input_dim, self.input_dim)
        )
        return ConditionedMatrixExponential(
            weights,
            iterations=self.iterations,
            normalization=self.normalization,
            bound=self.bound,
        )


# =========================================================================
# Generalized channel permute (Glow 1x1 invertible convolution)
# =========================================================================


class ConditionedGeneralizedChannelPermute(Transform):
    """1x1 invertible convolution over channels of (..., C, H, W) images,
    parameterized by a fixed permutation and an LU decomposition
    (ref ``generalized_channel_permute.py:16``)."""

    bijective = True

    def __init__(self, permutation=None, LU=None):
        super().__init__()
        self.permutation = permutation
        self.LU = LU

    @property
    def domain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, 3)

    @property
    def codomain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, 3)

    def _PLU(self):
        LU = self.LU
        C = LU.shape[-1]
        L = jnp.tril(LU, -1) + jnp.eye(C)
        U = jnp.triu(LU)
        return self.permutation, L, U

    def __call__(self, x):
        P, L, U = self._PLU()
        filters = P @ L @ U
        # channel mixing: y[..., c, h, w] = sum_k filters[c, k] x[..., k, h, w]
        return jnp.einsum("...ck,...khw->...chw", filters, x)

    def _inverse(self, y):
        P, L, U = self._PLU()
        shape = y.shape
        Py = jnp.einsum("...kc,...khw->...chw", P, y)  # P^T y
        Py_flat = Py.reshape(shape[:-2] + (-1,))
        batch = Py_flat.shape[:-2]
        L_b = jnp.broadcast_to(L, batch + L.shape[-2:])
        U_b = jnp.broadcast_to(U, batch + U.shape[-2:])
        Ux = jax.scipy.linalg.solve_triangular(L_b, Py_flat, lower=True)
        x = jax.scipy.linalg.solve_triangular(U_b, Ux, lower=False)
        return x.reshape(shape)

    def log_abs_det_jacobian(self, x, y):
        h, w = x.shape[-2:]
        U_diag = jnp.diagonal(self.LU, axis1=-2, axis2=-1)
        ladj = h * w * jnp.sum(jnp.log(jnp.abs(U_diag)), axis=-1)
        return jnp.broadcast_to(ladj, x.shape[:-3])


class GeneralizedChannelPermute(ConditionedGeneralizedChannelPermute):
    """Learnable LU 1x1 conv (ref ``generalized_channel_permute.py:111``)."""

    def __init__(self, name: str, channels: int = 3, permutation=None):
        key = jax.random.key(zlib.crc32(name.encode()))
        W = jax.random.normal(key, (channels, channels)) / math.sqrt(
            channels
        )
        Q, R = jnp.linalg.qr(W)
        if permutation is None:
            permutation = jax.random.permutation(
                jax.random.fold_in(key, 1), channels
            )
        else:
            permutation = jnp.asarray(permutation)
            if permutation.shape != (channels,):
                raise ValueError(
                    f"permutation must have length {channels}"
                )
        P = jnp.eye(channels)[permutation]
        LU0 = jnp.tril(Q, -1) + jnp.triu(R)
        LU = pyro_param(f"{name}$$$LU", LU0)
        super().__init__(P, LU)


class ConditionalGeneralizedChannelPermute(ConditionalTransformModule):
    """Ref ``generalized_channel_permute.py:200``."""

    def __init__(self, nn: Callable, channels: int = 3, permutation=None):
        self.nn = nn
        self.channels = channels
        if permutation is None:
            permutation = jax.random.permutation(
                jax.random.key(0), channels
            )
        self.permutation = jnp.eye(channels)[jnp.asarray(permutation)]

    def condition(self, context):
        flat = self.nn(context)
        LU = flat.reshape(
            flat.shape[:-1] + (self.channels, self.channels)
        )
        return ConditionedGeneralizedChannelPermute(self.permutation, LU)


# =========================================================================
# Spline autoregressive / coupling
# =========================================================================


class SplineAutoregressive(Transform):
    """Autoregressive rational-quadratic spline flow (ref
    ``spline_autoregressive.py:18``; Durkan et al. 2019)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True
    autoregressive = True

    def __init__(
        self,
        input_dim: int,
        autoregressive_nn: Callable,
        count_bins: int = 8,
        bound: float = 3.0,
        order: str = "linear",
    ):
        super().__init__()
        self.input_dim = input_dim
        self.arn = autoregressive_nn
        self.count_bins = count_bins
        self.bound = bound
        self.order = order

    def _spline(self, x):
        w, h, d = self.arn(x)
        # arn emits (..., K, D)-shaped params; Spline wants (..., D, K)
        return Spline(
            jnp.swapaxes(w, -1, -2),
            jnp.swapaxes(h, -1, -2),
            jnp.swapaxes(d, -1, -2),
            bound=self.bound,
        )

    def __call__(self, x):
        return self._spline(x)(x)

    def _inverse(self, y):
        D = y.shape[-1]

        def body(i, x):
            spline = self._spline(x)
            xi = spline._inverse(y)
            return x.at[..., i].set(xi[..., i])

        return jax.lax.fori_loop(0, D, body, jnp.zeros_like(y))

    def log_abs_det_jacobian(self, x, y):
        return self._spline(x).log_abs_det_jacobian(x, y)

    autoregressive = True


class ConditionalSpline(ConditionalTransformModule):
    """Elementwise spline with NN-emitted knots (ref ``spline.py``
    ConditionalSpline)."""

    def __init__(
        self,
        nn: Callable,
        input_dim: int,
        count_bins: int = 8,
        bound: float = 3.0,
        order: str = "linear",
    ):
        self.nn = nn
        self.input_dim = input_dim
        self.count_bins = count_bins
        self.bound = bound
        self.order = order

    def condition(self, context):
        w, h, d = self.nn(context)
        D, K = self.input_dim, self.count_bins
        w = w.reshape(w.shape[:-1] + (D, K))
        h = h.reshape(h.shape[:-1] + (D, K))
        d = d.reshape(d.shape[:-1] + (D, K - 1))
        return Spline(w, h, d, bound=self.bound)


class ConditionalSplineAutoregressive(ConditionalTransformModule):
    """Ref ``spline_autoregressive.py:134``."""

    def __init__(self, input_dim: int, autoregressive_nn, **kwargs):
        self.input_dim = input_dim
        self.nn = autoregressive_nn
        self.kwargs = kwargs

    def condition(self, context):
        return SplineAutoregressive(
            self.input_dim,
            lambda x: self.nn(x, context=context),
            **self.kwargs,
        )


class SplineCoupling(Transform):
    """Coupling rational-quadratic spline flow (ref
    ``spline_coupling.py:15``): lower split through an elementwise
    spline, upper split through a spline conditioned on the lower."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    def __init__(
        self,
        input_dim: int,
        split_dim: int,
        hypernet: Callable,
        lower_spline: Optional[Spline] = None,
        count_bins: int = 8,
        bound: float = 3.0,
        order: str = "linear",
        identity: bool = False,
    ):
        super().__init__()
        self.input_dim = input_dim
        self.split_dim = split_dim
        self.count_bins = count_bins
        self.bound = bound
        self.identity = identity
        self.lower_spline = lower_spline
        self.upper = ConditionalSpline(
            hypernet, input_dim - split_dim, count_bins, bound, order
        )
        if not identity and lower_spline is None:
            raise ValueError(
                "lower_spline params required unless identity=True"
            )

    def __call__(self, x):
        x1, x2 = x[..., : self.split_dim], x[..., self.split_dim :]
        y1 = x1 if self.identity else self.lower_spline(x1)
        y2 = self.upper.condition(x1)(x2)
        return jnp.concatenate([y1, y2], axis=-1)

    def _inverse(self, y):
        y1, y2 = y[..., : self.split_dim], y[..., self.split_dim :]
        x1 = y1 if self.identity else self.lower_spline._inverse(y1)
        x2 = self.upper.condition(x1)._inverse(y2)
        return jnp.concatenate([x1, x2], axis=-1)

    def log_abs_det_jacobian(self, x, y):
        x1, x2 = x[..., : self.split_dim], x[..., self.split_dim :]
        y1, y2 = y[..., : self.split_dim], y[..., self.split_dim :]
        ladj = self.upper.condition(x1).log_abs_det_jacobian(x2, y2)
        if not self.identity:
            ladj = ladj + self.lower_spline.log_abs_det_jacobian(x1, y1)
        return ladj


# =========================================================================
# Conditional variants of the round-1 flows
# =========================================================================


class ConditionalAffineAutoregressive(ConditionalTransformModule):
    """Ref ``affine_autoregressive.py`` ConditionalAffineAutoregressive."""

    def __init__(self, autoregressive_nn, **kwargs):
        self.nn = autoregressive_nn
        self.kwargs = kwargs

    def condition(self, context):
        return AffineAutoregressive(
            lambda x: self.nn(x, context=context), **self.kwargs
        )


class ConditionalAffineCoupling(ConditionalTransformModule):
    """Ref ``affine_coupling.py`` ConditionalAffineCoupling."""

    def __init__(self, split_dim: int, hypernet, **kwargs):
        self.split_dim = split_dim
        self.nn = hypernet
        self.kwargs = kwargs

    def condition(self, context):
        return AffineCoupling(
            self.split_dim,
            lambda x1: self.nn(x1, context),
            **self.kwargs,
        )


class ConditionalPlanar(ConditionalTransformModule):
    """Ref ``planar.py`` ConditionalPlanar."""

    def __init__(self, nn: Callable):
        self.nn = nn

    def condition(self, context):
        bias, u, w = self.nn(context)
        return Planar(bias, u, w)


class ConditionalRadial(ConditionalTransformModule):
    """Ref ``radial.py`` ConditionalRadial."""

    def __init__(self, nn: Callable):
        self.nn = nn

    def condition(self, context):
        x0, alpha, beta = self.nn(context)
        return Radial(x0, alpha, beta)


class ConditionalHouseholder(ConditionalTransformModule):
    """Ref ``householder.py`` ConditionalHouseholder."""

    def __init__(self, input_dim: int, nn: Callable, count_transforms=1):
        self.input_dim = input_dim
        self.nn = nn
        self.count_transforms = count_transforms

    def condition(self, context):
        u = self.nn(context)
        if isinstance(u, tuple):
            u = jnp.stack(u, axis=-2)
        else:
            u = u.reshape(
                u.shape[:-1] + (self.count_transforms, self.input_dim)
            )
        return Householder(u)


# =========================================================================
# factories (ref transforms/__init__.py bottom helpers)
# =========================================================================


def iterated(repeats: int, base_fn: Callable, *args, **kwargs):
    """Compose ``repeats`` fresh instances of ``base_fn(*args, **kwargs)``
    (ref ``transforms/__init__.py:158``).  When the factory takes a
    ``name`` first argument, each repeat gets a distinct name suffix."""
    parts = []
    for i in range(repeats):
        if args and isinstance(args[0], str):
            parts.append(
                base_fn(f"{args[0]}_{i}", *args[1:], **kwargs)
            )
        else:
            parts.append(base_fn(*args, **kwargs))
    return ComposeTransformModule(parts)


def sylvester(name: str, input_dim: int, count_transforms=None) -> Sylvester:
    """Factory for :class:`Sylvester` (ref ``sylvester.py:160``)."""
    if count_transforms is None:
        count_transforms = input_dim // 2 + 1
    key = jax.random.key(zlib.crc32(name.encode()))
    ks = jax.random.split(key, 6)
    D = input_dim
    u = pyro_param(
        f"{name}$$$u_unnormed",
        jax.random.uniform(ks[0], (count_transforms, D), minval=-0.01,
                           maxval=0.01) + 1.0,
    )
    Rd = pyro_param(
        f"{name}$$$R_dense",
        jax.random.uniform(ks[1], (D, D), minval=-0.01, maxval=0.01),
    )
    Sd = pyro_param(
        f"{name}$$$S_dense",
        jax.random.uniform(ks[2], (D, D), minval=-0.01, maxval=0.01),
    )
    Rdiag = pyro_param(
        f"{name}$$$R_diag",
        jax.random.uniform(ks[3], (D,), minval=-0.01, maxval=0.01),
    )
    Sdiag = pyro_param(
        f"{name}$$$S_diag",
        jax.random.uniform(ks[4], (D,), minval=-0.01, maxval=0.01),
    )
    b = pyro_param(
        f"{name}$$$b",
        jax.random.uniform(ks[5], (D,), minval=-0.01, maxval=0.01),
    )
    return Sylvester(u, Rd, Sd, Rdiag, Sdiag, b)


def block_autoregressive(name: str, input_dim: int, **kwargs):
    """Factory for :class:`BlockAutoregressive` (ref
    ``block_autoregressive.py:287``)."""
    return BlockAutoregressive(name, input_dim, **kwargs)


def neural_autoregressive(
    name: str,
    input_dim: int,
    hidden_dims=None,
    activation: str = "sigmoid",
    width: int = 16,
):
    """Factory for :class:`NeuralAutoregressive` (ref
    ``neural_autoregressive.py:212``)."""
    from ..nn import flax_module
    from ..nn.auto_reg_nn import AutoRegressiveNN

    if hidden_dims is None:
        hidden_dims = [3 * input_dim + 1]
    arn = flax_module(
        name,
        AutoRegressiveNN(
            input_dim, tuple(hidden_dims), param_dims=(width,) * 3
        ),
        jnp.zeros((1, input_dim)),
    )
    return NeuralAutoregressive(
        arn, hidden_units=width, activation=activation
    )


def conditional_neural_autoregressive(
    name: str,
    input_dim: int,
    context_dim: int,
    hidden_dims=None,
    activation: str = "sigmoid",
    width: int = 16,
):
    """Ref ``neural_autoregressive.py:239``."""
    from ..nn import flax_module
    from ..nn.auto_reg_nn import ConditionalAutoRegressiveNN

    if hidden_dims is None:
        hidden_dims = [3 * input_dim + 1]
    arn = flax_module(
        name,
        ConditionalAutoRegressiveNN(
            input_dim,
            tuple(hidden_dims),
            param_dims=(width,) * 3,
            context_dim=context_dim,
        ),
        jnp.zeros((1, input_dim)),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalNeuralAutoregressive(
        arn, hidden_units=width, activation=activation
    )


def polynomial(name: str, input_dim: int, hidden_dims=None):
    """Factory for :class:`Polynomial` (ref ``polynomial.py:170``)."""
    from ..nn import flax_module
    from ..nn.auto_reg_nn import AutoRegressiveNN

    count_degree, count_sum = 4, 3
    if hidden_dims is None:
        hidden_dims = [input_dim * 10]
    arn = flax_module(
        name,
        AutoRegressiveNN(
            input_dim,
            tuple(hidden_dims),
            param_dims=((count_degree + 1) * count_sum,),
        ),
        jnp.zeros((1, input_dim)),
    )

    def arn_flat(x):
        out = arn(x)
        # (..., (deg+1)*sum, D) -> (..., sum*(deg+1)*D) flat
        return out.reshape(out.shape[:-2] + (-1,))

    c = pyro_param(
        f"{name}$$$c",
        jax.random.uniform(
            jax.random.key(zlib.crc32(name.encode())),
            (input_dim,),
            minval=-1.0 / math.sqrt(input_dim),
            maxval=1.0 / math.sqrt(input_dim),
        ),
    )
    return Polynomial(
        arn_flat, input_dim, count_degree=count_degree,
        count_sum=count_sum, c=c,
    )


def matrix_exponential(name: str, input_dim: int, **kwargs):
    """Ref ``matrix_exponential.py:262``."""
    return MatrixExponential(name, input_dim, **kwargs)


def conditional_matrix_exponential(
    name: str, input_dim: int, context_dim: int, hidden_dims=None, **kwargs
):
    """Ref ``matrix_exponential.py:292``."""
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN

    if hidden_dims is None:
        hidden_dims = [input_dim * 10, input_dim * 10]
    net = flax_module(
        name,
        DenseNN(
            context_dim, tuple(hidden_dims), (input_dim * input_dim,)
        ),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalMatrixExponential(input_dim, net, **kwargs)


def generalized_channel_permute(
    name: str = "gcp", channels: int = 3, permutation=None, **kwargs
):
    """Ref ``generalized_channel_permute.py:286``."""
    return GeneralizedChannelPermute(
        name, channels=channels, permutation=permutation, **kwargs
    )


def conditional_generalized_channel_permute(
    name: str, context_dim: int, channels: int = 3, hidden_dims=None
):
    """Ref ``generalized_channel_permute.py:300``."""
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN

    if hidden_dims is None:
        hidden_dims = [channels * 10, channels * 10]
    net = flax_module(
        name,
        DenseNN(context_dim, tuple(hidden_dims), (channels * channels,)),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalGeneralizedChannelPermute(net, channels=channels)


def spline_autoregressive(
    name: str,
    input_dim: int,
    hidden_dims=None,
    count_bins: int = 8,
    bound: float = 3.0,
    order: str = "linear",
):
    """Ref ``spline_autoregressive.py:220``."""
    from ..nn import flax_module
    from ..nn.auto_reg_nn import AutoRegressiveNN

    if hidden_dims is None:
        hidden_dims = [input_dim * 10, input_dim * 10]
    arn = flax_module(
        name,
        AutoRegressiveNN(
            input_dim,
            tuple(hidden_dims),
            param_dims=(count_bins, count_bins, count_bins - 1),
        ),
        jnp.zeros((1, input_dim)),
    )
    return SplineAutoregressive(
        input_dim, arn, count_bins=count_bins, bound=bound, order=order
    )


def conditional_spline_autoregressive(
    name: str,
    input_dim: int,
    context_dim: int,
    hidden_dims=None,
    count_bins: int = 8,
    bound: float = 3.0,
    order: str = "linear",
):
    """Ref ``spline_autoregressive.py:254``."""
    from ..nn import flax_module
    from ..nn.auto_reg_nn import ConditionalAutoRegressiveNN

    if hidden_dims is None:
        hidden_dims = [input_dim * 10, input_dim * 10]
    arn = flax_module(
        name,
        ConditionalAutoRegressiveNN(
            input_dim,
            tuple(hidden_dims),
            param_dims=(count_bins, count_bins, count_bins - 1),
            context_dim=context_dim,
        ),
        jnp.zeros((1, input_dim)),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalSplineAutoregressive(
        input_dim, arn, count_bins=count_bins, bound=bound, order=order
    )


def spline_coupling(
    name: str,
    input_dim: int,
    split_dim=None,
    hidden_dims=None,
    count_bins: int = 8,
    bound: float = 3.0,
):
    """Ref ``spline_coupling.py:168``."""
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN
    from .flows import spline as _spline_factory

    if split_dim is None:
        split_dim = input_dim // 2
    if hidden_dims is None:
        hidden_dims = [input_dim * 10, input_dim * 10]
    upper_dim = input_dim - split_dim
    net = flax_module(
        name,
        DenseNN(
            split_dim,
            tuple(hidden_dims),
            (
                upper_dim * count_bins,
                upper_dim * count_bins,
                upper_dim * (count_bins - 1),
            ),
        ),
        jnp.zeros((1, split_dim)),
    )
    lower = _spline_factory(
        f"{name}$$$lower", split_dim, count_bins=count_bins, bound=bound
    )
    return SplineCoupling(
        input_dim, split_dim, net, lower_spline=lower,
        count_bins=count_bins, bound=bound,
    )


def conditional_spline(
    name: str,
    input_dim: int,
    context_dim: int,
    hidden_dims=None,
    count_bins: int = 8,
    bound: float = 3.0,
    order: str = "linear",
):
    """Ref ``spline.py`` conditional_spline."""
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN

    if hidden_dims is None:
        hidden_dims = [input_dim * 10]
    net = flax_module(
        name,
        DenseNN(
            context_dim,
            tuple(hidden_dims),
            (
                input_dim * count_bins,
                input_dim * count_bins,
                input_dim * (count_bins - 1),
            ),
        ),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalSpline(
        net, input_dim, count_bins=count_bins, bound=bound, order=order
    )


def conditional_affine_autoregressive(
    name: str, input_dim: int, context_dim: int, hidden_dims=None, **kwargs
):
    """Ref ``affine_autoregressive.py`` helper."""
    from ..nn import flax_module
    from ..nn.auto_reg_nn import ConditionalAutoRegressiveNN

    if hidden_dims is None:
        hidden_dims = [40 * input_dim]
    arn = flax_module(
        name,
        ConditionalAutoRegressiveNN(
            input_dim, tuple(hidden_dims), context_dim=context_dim
        ),
        jnp.zeros((1, input_dim)),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalAffineAutoregressive(arn, **kwargs)


def conditional_affine_coupling(
    name: str,
    input_dim: int,
    context_dim: int,
    hidden_dims=None,
    split_dim=None,
    **kwargs,
):
    """Ref ``affine_coupling.py`` helper."""
    from ..nn import flax_module
    from ..nn.dense_nn import ConditionalDenseNN

    if split_dim is None:
        split_dim = input_dim // 2
    if hidden_dims is None:
        hidden_dims = [10 * input_dim]
    out_dim = input_dim - split_dim
    net = flax_module(
        name,
        ConditionalDenseNN(
            split_dim, context_dim, tuple(hidden_dims),
            (out_dim, out_dim),
        ),
        jnp.zeros((1, split_dim)),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalAffineCoupling(split_dim, net, **kwargs)


def conditional_planar(
    name: str, input_dim: int, context_dim: int, hidden_dims=None
):
    """Ref ``planar.py`` helper."""
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN

    if hidden_dims is None:
        hidden_dims = [input_dim * 10, input_dim * 10]
    net = flax_module(
        name,
        DenseNN(context_dim, tuple(hidden_dims), (1, input_dim, input_dim)),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalPlanar(net)


def conditional_radial(
    name: str, input_dim: int, context_dim: int, hidden_dims=None
):
    """Ref ``radial.py`` helper."""
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN

    if hidden_dims is None:
        hidden_dims = [input_dim * 10, input_dim * 10]
    net = flax_module(
        name,
        DenseNN(context_dim, tuple(hidden_dims), (input_dim, 1, 1)),
        jnp.zeros((1, context_dim)),
    )
    return ConditionalRadial(lambda c: net(c))


def conditional_householder(
    name: str, input_dim: int, context_dim: int, count_transforms: int = 1,
    hidden_dims=None,
):
    """Ref ``householder.py`` helper."""
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN

    if hidden_dims is None:
        hidden_dims = [input_dim * 10, input_dim * 10]
    net = flax_module(
        name,
        DenseNN(
            context_dim,
            tuple(hidden_dims),
            (input_dim,) * count_transforms,
        ),
        jnp.zeros((1, context_dim)),
    )

    def nn_stacked(context):
        out = net(context)
        return out if isinstance(out, tuple) else (out,)

    return ConditionalHouseholder(
        input_dim,
        lambda c: jnp.stack(nn_stacked(c), axis=-2),
        count_transforms,
    )


__all__ = [
    "BlockAutoregressive",
    "ConditionalAffineAutoregressive",
    "ConditionalAffineCoupling",
    "ConditionalGeneralizedChannelPermute",
    "ConditionalHouseholder",
    "ConditionalMatrixExponential",
    "ConditionalNeuralAutoregressive",
    "ConditionalPlanar",
    "ConditionalRadial",
    "ConditionalSpline",
    "ConditionalSplineAutoregressive",
    "ConditionedGeneralizedChannelPermute",
    "ConditionedMatrixExponential",
    "GeneralizedChannelPermute",
    "MatrixExponential",
    "NeuralAutoregressive",
    "Polynomial",
    "SplineAutoregressive",
    "SplineCoupling",
    "Sylvester",
    "block_autoregressive",
    "conditional_affine_autoregressive",
    "conditional_affine_coupling",
    "conditional_generalized_channel_permute",
    "conditional_householder",
    "conditional_matrix_exponential",
    "conditional_neural_autoregressive",
    "conditional_planar",
    "conditional_radial",
    "conditional_spline",
    "conditional_spline_autoregressive",
    "generalized_channel_permute",
    "iterated",
    "matrix_exponential",
    "neural_autoregressive",
    "polynomial",
    "spline_autoregressive",
    "spline_coupling",
    "sylvester",
]
