"""Tracking tests (mirrors ``tests/contrib/tracking``)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyro_tpu.contrib.tracking import (
    EKFState,
    LSH,
    MarginalAssignment,
    NcvContinuous,
    PositionMeasurement,
    merge_points,
)


def test_ekf_tracks_constant_velocity():
    dm = NcvContinuous(dimension=4, sv2=0.01)
    state = EKFState(dm, jnp.zeros(4), jnp.eye(4), time=0.0)
    true_pos = np.array([0.0, 0.0])
    true_vel = np.array([1.0, -0.5])
    rng = np.random.RandomState(0)
    for t in range(1, 25):
        state = state.predict(1.0)
        z = true_pos + true_vel * t + 0.05 * rng.randn(2)
        meas = PositionMeasurement(jnp.asarray(z), 0.05**2 * jnp.eye(2), time=t)
        state, (dz, S) = state.update(meas)
    est = np.asarray(state.mean)
    assert np.allclose(est[:2], true_pos + true_vel * 24, atol=0.2)
    assert np.allclose(est[2:], true_vel, atol=0.15)
    assert np.isfinite(float(state.log_likelihood_of_update(meas)))


def test_marginal_assignment_prefers_likely_object():
    exists_logits = jnp.array([2.0, 2.0])
    # detection 0 strongly matches object 0; detection 1 matches object 1
    assign_logits = jnp.array([[3.0, -3.0], [-3.0, 3.0]])
    ma = MarginalAssignment(exists_logits, assign_logits)
    probs = np.asarray(ma.assign_dist.probs)
    assert probs[0].argmax() == 0
    assert probs[1].argmax() == 1
    e = np.asarray(ma.exists_dist.probs)
    assert (e > 0.5).all()


def test_lsh_and_merge_points():
    pts = jnp.array(
        [[0.0, 0.0], [0.05, 0.0], [5.0, 5.0], [5.1, 5.0]]
    )
    merged, groups = merge_points(pts, radius=0.5)
    assert merged.shape[0] == 2
    assert sorted(len(g) for g in groups) == [2, 2]
    lsh = LSH(radius=1.0)
    for i, p in enumerate(np.asarray(pts)):
        lsh.add(p, i)
    near = lsh.nearby(np.array([0.01, 0.01]))
    assert 0 in near and 1 in near and 2 not in near


def test_dynamic_model_family():
    from pyro_tpu.contrib.tracking.dynamic_models import (
        NcpContinuous,
        NcpDiscrete,
        NcvContinuous,
        NcvDiscrete,
    )

    x = jnp.array([1.0, 2.0, 0.5, -0.5])
    for cls, kw in [
        (NcpContinuous, dict(dimension=4, sv2=0.1)),
        (NcpDiscrete, dict(dimension=4, sv2=0.1)),
        (NcvContinuous, dict(dimension=4, sa2=0.1)),
        (NcvDiscrete, dict(dimension=4, sa2=0.1)),
    ]:
        dm = cls(**kw)
        out = dm(x, 2.0)
        assert out.shape == x.shape
        Q = dm.process_noise_cov(2.0)
        assert Q.shape == (4, 4)
        evals = np.linalg.eigvalsh(np.asarray(Q))
        assert (evals > -1e-6).all(), (cls.__name__, evals)
        pv = dm.mean2pv(x if "Ncv" in cls.__name__ else x)
        assert dm.cov2pv(jnp.eye(dm.dimension)).shape == (
            dm.dimension_pv,
            dm.dimension_pv,
        )
        assert dm.process_noise_dist(1.0).event_shape == (4,)
    # NCV integrates position by velocity
    ncv = NcvContinuous(dimension=4, sa2=0.1)
    out = ncv(x, 2.0)
    np.testing.assert_allclose(np.asarray(out[:2]), [2.0, 1.0])
    # jacobian matches autodiff
    np.testing.assert_allclose(
        np.asarray(ncv.jacobian(2.0)),
        np.asarray(jax.jacfwd(lambda v: ncv(v, 2.0))(x)),
    )


def test_ekf_distribution_log_prob():
    from pyro_tpu.contrib.tracking import EKFDistribution, NcvContinuous

    dm = NcvContinuous(dimension=4, sa2=0.01)
    T = 10
    d = EKFDistribution(
        x0=jnp.zeros(4),
        P0=jnp.eye(4),
        dynamic_model=dm,
        measurement_cov=0.1 * jnp.eye(2),
        time_steps=T,
        dt=1.0,
    )
    rng = np.random.RandomState(1)
    vel = np.array([1.0, -0.5])
    zs = jnp.asarray(
        np.arange(T)[:, None] * vel + 0.05 * rng.randn(T, 2)
    )
    lp_track = float(jax.jit(d.log_prob)(zs))
    zs_noise = jnp.asarray(5.0 * rng.randn(T, 2))
    lp_noise = float(jax.jit(d.log_prob)(zs_noise))
    assert np.isfinite(lp_track) and np.isfinite(lp_noise)
    # a coherent constant-velocity track is far more likely
    assert lp_track > lp_noise + 10.0
    states = d.filter_states(zs)
    assert len(states) == T
    est = np.asarray(states[-1].mean)
    assert np.allclose(est[2:], vel, atol=0.3)
