"""Generalized linear mixed models for experiment design.

Ref ``pyro/contrib/oed/glmm/glmm.py``: factory functions producing
Bayesian (generalized) linear models parameterized by a design tensor,
plus the matching mean-field guides and the analytic linear-Gaussian
posterior used to validate EIG estimators.

Models broadcast over arbitrary leading design dims (a batch of candidate
designs), which is how the EIG estimators in :mod:`.eig` evaluate many
designs in one vmapped pass.
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from ...distributions import constraints

__all__ = [
    "analytic_posterior_cov",
    "bayesian_linear_model",
    "group_assignment_matrix",
    "group_linear_model",
    "group_normal_guide",
    "known_covariance_linear_model",
    "logistic_regression_model",
    "normal_guide",
    "zero_mean_unit_obs_sd_lm",
]


def bayesian_linear_model(
    design,
    w_means=None,
    w_sqrtlambdas=None,
    obs_sd=None,
    response="normal",
    response_label="y",
):
    """Bayesian linear regression over a design matrix
    (ref ``glmm.py:209``, known-obs_sd subset).

    ``design`` has shape ``batch_shape + (n, p)``; the coefficient groups
    in ``w_means``/``w_sqrtlambdas`` partition the p columns.  For
    ``response="normal"``, y = Xw + eps; for ``"bernoulli"``,
    logit p(y=1) = Xw.
    """
    w_means = w_means or {}
    w_sqrtlambdas = w_sqrtlambdas or {}
    batch_shape = jnp.shape(design)[:-2]
    ws = []
    for name, w_sqrtlambda in w_sqrtlambdas.items():
        mean = jnp.broadcast_to(
            w_means[name], batch_shape + jnp.shape(w_sqrtlambda)
        )
        sd = (
            obs_sd / w_sqrtlambda
            if obs_sd is not None
            else 1.0 / w_sqrtlambda
        )
        w = pyro.sample(
            name, dist.Normal(mean, sd * jnp.ones_like(mean)).to_event(1)
        )
        ws.append(w)
    w = jnp.concatenate(
        [
            jnp.broadcast_to(
                wi,
                jnp.broadcast_shapes(*(x.shape[:-1] for x in ws))
                + wi.shape[-1:],
            )
            for wi in ws
        ],
        -1,
    )

    prediction_mean = jnp.einsum("...np,...p->...n", design, w)
    if response == "normal":
        return pyro.sample(
            response_label,
            dist.Normal(prediction_mean, obs_sd).to_event(1),
        )
    elif response == "bernoulli":
        return pyro.sample(
            response_label,
            dist.Bernoulli(logits=prediction_mean).to_event(1),
        )
    else:
        raise ValueError(f"unknown response distribution: {response}")


def normal_inv_gamma_family_guide(design, obs_sd, w_sizes):
    """Mean-field Normal guide over the coefficient groups
    (ref ``glmm.py:normal_inv_gamma_family_guide``, known-obs_sd branch)."""
    for name, size in w_sizes.items():
        shape = jnp.shape(design)[:-2] + (
            size if isinstance(size, int) else int(size),
        )
        loc = pyro.param(f"{name}_guide_mean", jnp.zeros(shape))
        scale = pyro.param(
            f"{name}_guide_scale_tril",
            jnp.ones(shape),
            constraint=constraints.positive,
        )
        pyro.sample(name, dist.Normal(loc, scale).to_event(1))


def normal_guide(observation_sd, coef_shape, coef_label="w"):
    return functools.partial(
        normal_inv_gamma_family_guide,
        obs_sd=observation_sd,
        w_sizes={coef_label: int(coef_shape[-1])},
    )


def known_covariance_linear_model(
    coef_means,
    coef_sds,
    observation_sd,
    coef_labels="w",
    observation_label="y",
):
    """(ref ``glmm.py:22``)"""
    if not isinstance(coef_means, list):
        coef_means = [coef_means]
    if not isinstance(coef_sds, list):
        coef_sds = [coef_sds]
    if not isinstance(coef_labels, list):
        coef_labels = [coef_labels]
    model = functools.partial(
        bayesian_linear_model,
        w_means=OrderedDict(
            (label, jnp.broadcast_to(m, jnp.shape(sd)))
            for label, m, sd in zip(coef_labels, coef_means, coef_sds)
        ),
        w_sqrtlambdas=OrderedDict(
            (label, 1.0 / (observation_sd * jnp.asarray(sd)))
            for label, sd in zip(coef_labels, coef_sds)
        ),
        obs_sd=observation_sd,
        response_label=observation_label,
    )
    model.obs_sd = observation_sd
    model.w_sds = OrderedDict(zip(coef_labels, coef_sds))
    model.w_sizes = OrderedDict(
        (label, jnp.shape(sd)[-1]) for label, sd in zip(coef_labels, coef_sds)
    )
    model.observation_label = observation_label
    return model


def zero_mean_unit_obs_sd_lm(coef_sd, coef_label="w"):
    """(ref ``glmm.py:102``)"""
    model = known_covariance_linear_model(
        jnp.asarray(0.0),
        coef_sd,
        jnp.asarray(1.0),
        coef_labels=coef_label,
    )
    guide = normal_guide(jnp.asarray(1.0), jnp.shape(coef_sd), coef_label)
    return model, guide


def group_linear_model(
    coef1_mean,
    coef1_sd,
    coef2_mean,
    coef2_sd,
    observation_sd,
    coef1_label="w1",
    coef2_label="w2",
    observation_label="y",
):
    """(ref ``glmm.py:65``)"""
    return known_covariance_linear_model(
        [coef1_mean, coef2_mean],
        [coef1_sd, coef2_sd],
        observation_sd,
        coef_labels=[coef1_label, coef2_label],
        observation_label=observation_label,
    )


def group_normal_guide(
    observation_sd, coef1_shape, coef2_shape, coef1_label="w1", coef2_label="w2"
):
    """(ref ``glmm.py:92``)"""
    return functools.partial(
        normal_inv_gamma_family_guide,
        obs_sd=observation_sd,
        w_sizes={
            coef1_label: int(coef1_shape[-1]),
            coef2_label: int(coef2_shape[-1]),
        },
    )


def logistic_regression_model(
    coef_mean, coef_sd, coef_label="w", observation_label="y"
):
    """(ref ``glmm.py:132``)"""
    return functools.partial(
        bayesian_linear_model,
        w_means={coef_label: coef_mean},
        w_sqrtlambdas={coef_label: 1.0 / jnp.asarray(coef_sd)},
        response="bernoulli",
        response_label=observation_label,
    )


def group_assignment_matrix(design):
    """One-dim tensor of group sizes -> binary indicator matrix
    (ref ``glmm.py:409``)."""
    import numpy as np

    design = np.asarray(design)
    n, p = int(design.sum()), int(design.shape[0])
    X = np.zeros((n, p), dtype=np.float32)
    t = 0
    for col, i in enumerate(design):
        i = int(i)
        if i > 0:
            X[t : t + i, col] = 1.0
        t += i
    if t < n:
        X[t:, -1] = 1.0
    return jnp.asarray(X)


def analytic_posterior_cov(prior_cov, x, obs_sd):
    """Posterior covariance of a linear-Gaussian model
    (ref ``glmm.py:448``)."""
    p = prior_cov.shape[-1]
    SigmaXX = prior_cov @ (x.T @ x)
    return prior_cov - jnp.linalg.inv(
        SigmaXX + (obs_sd**2) * jnp.eye(p)
    ) @ (SigmaXX @ prior_cov)
