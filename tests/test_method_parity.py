"""Distribution method-surface parity: mode/perplexity/infer_shapes,
property aliases, and matrix properties, value-checked against
torch.distributions (and reference pyro for the pyro-native classes).

Round 5 closed the method-level gaps found by diffing dir() of every
shared class against the reference: ``mode`` / ``perplexity`` /
``reshape`` / ``infer_shapes`` on the base, ``logits`` aliases,
MVT/LowRank/Wishart matrix properties, ``SineBivariateVonMises
.norm_const``, and ``SpanningTree.edge_mean`` / ``validate_edges``.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist

torch = pytest.importorskip("torch")
import torch.distributions as td  # noqa: E402

# APPEND (never insert(0)): the reference tree also contains top-level
# `examples/` and `tests/` packages; prepending would shadow this repo's
# same-named packages for every later test in the same pytest process.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")


def t(x):
    return torch.as_tensor(np.asarray(x), dtype=torch.float64)


MODE_CASES = [
    ("Normal", dist.Normal(0.5, 1.2), td.Normal(t(0.5), t(1.2))),
    ("Cauchy", dist.Cauchy(0.3, 2.0), td.Cauchy(t(0.3), t(2.0))),
    ("StudentT", dist.StudentT(5.0, 0.4, 1.1), td.StudentT(t(5.0), t(0.4), t(1.1))),
    ("Laplace", dist.Laplace(-0.2, 0.7), td.Laplace(t(-0.2), t(0.7))),
    ("Gumbel", dist.Gumbel(0.9, 1.4), td.Gumbel(t(0.9), t(1.4))),
    ("Exponential", dist.Exponential(2.0), td.Exponential(t(2.0))),
    ("Gamma", dist.Gamma(3.0, 2.0), td.Gamma(t(3.0), t(2.0))),
    ("Gamma<1", dist.Gamma(0.5, 2.0), td.Gamma(t(0.5), t(2.0))),
    ("Beta", dist.Beta(2.0, 5.0), td.Beta(t(2.0), t(5.0))),
    ("LogNormal", dist.LogNormal(0.3, 0.8), td.LogNormal(t(0.3), t(0.8))),
    ("HalfNormal", dist.HalfNormal(1.5), td.HalfNormal(t(1.5))),
    ("HalfCauchy", dist.HalfCauchy(1.5), td.HalfCauchy(t(1.5))),
    ("VonMises", dist.VonMises(0.7, 2.0), td.VonMises(t(0.7), t(2.0))),
    (
        "Dirichlet",
        dist.Dirichlet(jnp.array([2.0, 3.0, 7.0])),
        td.Dirichlet(t([2.0, 3.0, 7.0])),
    ),
    (
        "Bernoulli",
        dist.Bernoulli(jnp.array([0.2, 0.8])),
        td.Bernoulli(t([0.2, 0.8])),
    ),
    (
        "Categorical",
        dist.Categorical(jnp.array([0.2, 0.5, 0.3])),
        td.Categorical(t([0.2, 0.5, 0.3])),
    ),
    (
        "OneHotCategorical",
        dist.OneHotCategorical(jnp.array([0.2, 0.5, 0.3])),
        td.OneHotCategorical(t([0.2, 0.5, 0.3])),
    ),
    ("Poisson", dist.Poisson(3.7), td.Poisson(t(3.7))),
    (
        "Binomial",
        dist.Binomial(10, jnp.array([0.3, 0.62])),
        td.Binomial(10, t([0.3, 0.62])),
    ),
    ("Geometric", dist.Geometric(0.3), td.Geometric(t(0.3))),
    (
        "NegativeBinomial",
        dist.NegativeBinomial(8, 0.4),
        td.NegativeBinomial(t(8.0), t(0.4)),
    ),
    (
        "MultivariateNormal",
        dist.MultivariateNormal(jnp.array([0.5, -0.5]), covariance_matrix=jnp.eye(2)),
        td.MultivariateNormal(t([0.5, -0.5]), covariance_matrix=torch.eye(2, dtype=torch.float64)),
    ),
]


@pytest.mark.parametrize("name, ours, theirs", MODE_CASES, ids=lambda c: c if isinstance(c, str) else "")
def test_mode_matches_torch(name, ours, theirs):
    np.testing.assert_allclose(
        np.asarray(ours.mode, dtype=np.float64),
        theirs.mode.numpy(),
        rtol=1e-5,
        atol=1e-6,
        err_msg=name,
    )


def test_mode_base_raises():
    with pytest.raises(NotImplementedError, match="mode"):
        dist.Uniform(0.0, 1.0).mode


@pytest.mark.parametrize(
    "ours, theirs",
    [
        (dist.Normal(0.5, 1.2), td.Normal(t(0.5), t(1.2))),
        (dist.Gamma(3.0, 2.0), td.Gamma(t(3.0), t(2.0))),
        (dist.Categorical(jnp.array([0.2, 0.5, 0.3])), td.Categorical(t([0.2, 0.5, 0.3]))),
    ],
    ids=["Normal", "Gamma", "Categorical"],
)
def test_perplexity_matches_torch(ours, theirs):
    np.testing.assert_allclose(
        float(ours.perplexity()), float(theirs.perplexity()), rtol=1e-5
    )


def test_reshape_raises_renamed_api():
    with pytest.raises(Exception, match="expand_by"):
        dist.Normal(0.0, 1.0).reshape((2,))


def test_infer_shapes_univariate():
    assert dist.Normal.infer_shapes(loc=(3, 2), scale=()) == ((3, 2), ())
    assert dist.Gamma.infer_shapes(concentration=(5,), rate=(2, 1)) == (
        (2, 5),
        (),
    )
    with pytest.raises(NotImplementedError):
        dist.MultivariateNormal.infer_shapes(loc=(3,))


def test_logits_aliases():
    p = 0.3
    for ours, theirs in [
        (dist.Geometric(p), td.Geometric(t(p))),
        (dist.NegativeBinomial(5, p), td.NegativeBinomial(t(5.0), t(p))),
        (dist.ContinuousBernoulli(p), td.ContinuousBernoulli(t(p))),
    ]:
        np.testing.assert_allclose(
            float(ours.logits), float(theirs.logits), rtol=1e-5
        )


def test_mvt_matrix_properties():
    df = 6.0
    L = jnp.array([[1.0, 0.0], [0.4, 0.8]])
    ours = dist.MultivariateStudentT(df, jnp.zeros(2), L)
    theirs_cov = (df / (df - 2)) * np.asarray(L @ L.T, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(ours.covariance_matrix, dtype=np.float64),
        theirs_cov,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.precision_matrix, dtype=np.float64),
        np.linalg.inv(theirs_cov),
        rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(ours.mode), np.zeros(2))


def test_lowrank_precision_matches_dense_inverse():
    key = jax.random.key(0)
    W = jax.random.normal(key, (3, 2))
    d = jnp.array([0.5, 1.0, 2.0])
    ours = dist.LowRankMultivariateNormal(jnp.zeros(3), W, d)
    dense = np.asarray(W @ W.T + jnp.diag(d), dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(ours.precision_matrix, dtype=np.float64),
        np.linalg.inv(dense),
        rtol=1e-4,
        atol=1e-5,
    )


def test_wishart_matrix_properties():
    L = jnp.array([[1.0, 0.0], [0.3, 0.7]])
    df = 5.0
    ours = dist.Wishart(df, scale_tril=L)
    theirs = td.Wishart(t(df), scale_tril=t(np.asarray(L)))
    np.testing.assert_allclose(
        np.asarray(ours.precision_matrix, dtype=np.float64),
        theirs.precision_matrix.numpy(),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours.mode, dtype=np.float64),
        theirs.mode.numpy(),
        rtol=1e-5,
    )


def test_sine_bivariate_norm_const_matches_reference():
    import pyro.distributions as ref_dist

    params = dict(
        phi_loc=0.3, psi_loc=-0.6, phi_concentration=2.0,
        psi_concentration=3.0, correlation=0.9,
    )
    ours = dist.SineBivariateVonMises(**params)
    theirs = ref_dist.SineBivariateVonMises(
        **{k: t(v) for k, v in params.items()}
    )
    np.testing.assert_allclose(
        float(ours.norm_const), float(theirs.norm_const), rtol=1e-4
    )


def test_spanning_tree_edge_mean_matches_reference():
    import pyro.distributions as ref_dist

    V = 4
    K = V * (V - 1) // 2
    logits = np.linspace(-0.5, 0.8, K)
    ours = dist.SpanningTree(jnp.asarray(logits))
    theirs = ref_dist.SpanningTree(t(logits))
    np.testing.assert_allclose(
        np.asarray(ours.edge_mean, dtype=np.float64),
        theirs.edge_mean.numpy(),
        rtol=1e-4,
        atol=1e-6,
    )
    # marginals of a tree distribution sum to 2 * (V - 1) over the
    # symmetric matrix (each of the V-1 edges counted twice)
    assert float(jnp.sum(ours.edge_mean)) == pytest.approx(
        2 * (V - 1), rel=1e-3
    )


def test_spanning_tree_validate_edges():
    V = 4
    d = dist.SpanningTree(jnp.zeros(V * (V - 1) // 2))
    good = np.array([[0, 1], [0, 2], [2, 3]])
    d.validate_edges(good)
    with pytest.raises(ValueError):
        d.validate_edges(np.array([[1, 0], [0, 2], [2, 3]]))  # unsorted edge
    with pytest.raises(ValueError):
        d.validate_edges(np.array([[0, 1], [0, 1], [2, 3]]))  # not a tree


def test_affine_beta_properties():
    d = dist.AffineBeta(2.0, 3.0, -1.0, 4.0)
    assert float(d.loc) == -1.0 and float(d.scale) == 4.0
    assert float(d.low) == -1.0 and float(d.high) == 3.0
    assert float(d.concentration1) == 2.0
    assert float(d.sample_size) == 5.0


# ---------------------------------------------------------------------------
# transform surface (event_dim / clear_cache / flags / conditional inv)


def test_transform_event_dim_and_clear_cache():
    import pyro_tpu.distributions.transforms as T

    assert T.ExpTransform().event_dim == 0
    assert T.StickBreakingTransform().domain.event_dim == 1
    c = T.AffineTransform(0.0, 2.0).with_cache()
    x = jnp.ones(3)
    c(x)
    assert c._cached_x_y is not None
    c.clear_cache()
    assert c._cached_x_y is None
    # composed transforms recurse without error
    T.ComposeTransform([T.ExpTransform(), T.TanhTransform()]).clear_cache()


def test_transform_flags_match_reference():
    import pyro_tpu.distributions.transforms as T

    assert T.Permute(jnp.array([1, 0])).volume_preserving is True
    assert T.Householder.volume_preserving is True
    assert T.LowerCholeskyAffine.volume_preserving is False
    for cls in [
        T.AffineAutoregressive,
        T.BlockAutoregressive,
        T.NeuralAutoregressive,
        T.Polynomial,
        T.SplineAutoregressive,
    ]:
        assert cls.autoregressive is True, cls


def test_permute_inv_permutation():
    import pyro_tpu.distributions.transforms as T

    p = T.Permute(jnp.array([2, 0, 1]))
    np.testing.assert_array_equal(np.asarray(p.inv_permutation), [1, 2, 0])
    x = jnp.arange(3.0)
    np.testing.assert_allclose(np.asarray(p._inverse(p(x))), np.asarray(x))


def test_conditional_transform_module_inv():
    import pyro_tpu.distributions.transforms as T
    from pyro_tpu.distributions.conditional import ConditionalTransformModule

    class Shift(ConditionalTransformModule):
        def condition(self, context):
            return T.AffineTransform(context, 1.0)

    m = Shift()
    assert m.bijective and m.domain.event_dim == 1
    assert m.inv.inv is m
    shifted = m.inv.condition(jnp.ones(2))
    np.testing.assert_allclose(np.asarray(shifted(jnp.full(2, 3.0))), 2.0)


def test_cat_transform_length():
    import pyro_tpu.distributions.transforms as T

    ct = T.CatTransform(
        [T.ExpTransform(), T.ExpTransform()], dim=-1, lengths=[2, 3]
    )
    assert ct.length == 5
