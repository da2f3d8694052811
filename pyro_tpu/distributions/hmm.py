"""Hidden Markov model distributions with O(log T) exact marginalization.

Ref ``pyro/distributions/hmm.py``: ``DiscreteHMM:243``, ``GaussianHMM:434``
(Särkkä & García-Fernández 2019 temporal parallelization).  Generative
semantics match the reference exactly:

    z ~ initial;  repeat T times:  z ~ trans(z);  emit y ~ obs(z)

so ``event_shape = (T,) + observation event shape`` and homogeneous
parameters broadcast along a size-1 time axis.

TPU notes: time elimination for DiscreteHMM is a pairwise log-matmul-exp
reduction — each round is one batched ``jnp.einsum`` that XLA tiles onto
the MXU; GaussianHMM uses the info-form Gaussian algebra in
``pyro_tpu.ops.gaussian``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from . import constraints
from .discrete import Categorical
from .distribution import Distribution
from .util import broadcast_shape
from ..ops.gaussian import (
    Gaussian,
    gaussian_tensordot,
    matrix_and_mvn_to_gaussian,
    mvn_to_gaussian,
    sequential_gaussian_filter_sample,
    sequential_gaussian_tensordot,
)


def _logmatmulexp(x, y):
    """Numerically-stable batched log-space matmul: rides the MXU via a
    regular matmul of shifted exponentials, with an analytic custom VJP
    (ops/log_matmul.py — see its docstring for why this is pure XLA)."""
    from ..ops.log_matmul import logmatmulexp as _fused

    return _fused(x, y)


def _sequential_logmatmulexp(logits):
    """Reduce a (..., T, S, S) chain of log transition factors to a single
    (..., S, S) factor in ceil(log2 T) rounds (ref ``hmm.py:14``)."""
    while logits.shape[-3] > 1:
        time = logits.shape[-3]
        even_time = time // 2 * 2
        even_part = logits[..., :even_time, :, :]
        x_y = even_part.reshape(
            logits.shape[:-3] + (even_time // 2, 2) + logits.shape[-2:]
        )
        contracted = _logmatmulexp(x_y[..., 0, :, :], x_y[..., 1, :, :])
        if time > even_time:
            contracted = jnp.concatenate(
                [contracted, logits[..., even_time:, :, :]], axis=-3
            )
        logits = contracted
    return logits[..., 0, :, :]


class HiddenMarkovModel(Distribution):
    """Base with a time axis in event_shape (ref ``hmm.py:190``)."""

    _abstract = True

    def __init__(self, duration, batch_shape, event_shape):
        if duration is None and event_shape[0] != 1:
            duration = event_shape[0]
        elif duration is not None and event_shape[0] == 1:
            event_shape = (duration,) + tuple(event_shape[1:])
        self._duration = duration
        super().__init__(batch_shape, event_shape)

    @property
    def duration(self):
        return self._duration


class DiscreteHMM(HiddenMarkovModel):
    """Ref ``hmm.py:243``."""

    arg_constraints = {
        "initial_logits": constraints.real,
        "transition_logits": constraints.real,
    }

    def __init__(
        self,
        initial_logits,
        transition_logits,
        observation_dist,
        duration=None,
    ):
        initial_logits = jnp.asarray(initial_logits)
        transition_logits = jnp.asarray(transition_logits)
        if initial_logits.ndim < 1:
            raise ValueError("initial_logits needs at least 1 dim")
        if transition_logits.ndim < 2:
            raise ValueError("transition_logits needs at least 2 dims")
        if len(observation_dist.batch_shape) < 1:
            raise ValueError("observation_dist needs at least 1 batch dim")
        shape = broadcast_shape(
            initial_logits.shape[:-1] + (1,),
            transition_logits.shape[:-2],
            observation_dist.batch_shape[:-1],
        )
        batch_shape, time_shape = shape[:-1], shape[-1:]
        event_shape = tuple(time_shape) + observation_dist.event_shape
        self.initial_logits = initial_logits - logsumexp(
            initial_logits, axis=-1, keepdims=True
        )
        self.transition_logits = transition_logits - logsumexp(
            transition_logits, axis=-1, keepdims=True
        )
        self.observation_dist = observation_dist
        super().__init__(duration, batch_shape, event_shape)

    @property
    def support(self):  # type: ignore[override]
        return constraints.independent(self.observation_dist.support, 1)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        new = object.__new__(DiscreteHMM)
        new.initial_logits = jnp.broadcast_to(
            self.initial_logits,
            batch_shape + self.initial_logits.shape[-1:],
        )
        new.transition_logits = self.transition_logits
        new.observation_dist = self.observation_dist
        Distribution.__init__(new, batch_shape, self.event_shape)
        new._duration = self._duration
        new._pyro_init_args = self._pyro_init_args
        return new

    def _validate_value(self, value):
        """Reference error semantics (torch ``_validate_sample`` +
        strict broadcasting; see tests/test_hmm_shapes.py): reject values
        with missing event dims, mismatched event shape, or a time axis
        that disagrees with a non-broadcastable model time axis."""
        value = jnp.asarray(value)
        obs_ed = self.observation_dist.event_dim
        event_ndim = 1 + obs_ed
        if value.ndim < event_ndim:
            raise ValueError(
                f"value has too few dimensions: {value.shape}"
            )
        if obs_ed and tuple(value.shape[-obs_ed:]) != tuple(
            self.event_shape[1:]
        ):
            raise ValueError(
                "The right-most size of value must match event_shape: "
                f"{value.shape} vs {self.event_shape}"
            )
        t_model = self.event_shape[0]
        if t_model != 1 and value.shape[-event_ndim] != t_model:
            raise ValueError(
                "The right-most size of value must match event_shape: "
                f"{value.shape} vs {self.event_shape}"
            )
        # raises ValueError on incompatible batch dims
        broadcast_shape(value.shape[:-event_ndim], self.batch_shape)
        return value

    def log_prob(self, value):
        # combine observation and transition factors (ref ``hmm.py:352``)
        value = self._validate_value(value)
        value = jnp.expand_dims(
            value, -1 - self.observation_dist.event_dim
        )
        observation_logits = self.observation_dist.log_prob(value)
        result = self.transition_logits + jnp.expand_dims(
            observation_logits, -2
        )
        result = _sequential_logmatmulexp(result)
        result = self.initial_logits + logsumexp(result, axis=-1)
        return logsumexp(result, axis=-1)

    def filter(self, value) -> Categorical:
        """Posterior over the final state (ref ``hmm.py:371``)."""
        value = self._validate_value(value)
        value = jnp.expand_dims(
            value, -1 - self.observation_dist.event_dim
        )
        observation_logits = self.observation_dist.log_prob(value)
        logp = self.transition_logits + jnp.expand_dims(
            observation_logits, -2
        )
        logp = _sequential_logmatmulexp(logp)
        logp = logsumexp(
            jnp.expand_dims(self.initial_logits, -1) + logp, axis=-2
        )
        return Categorical(logits=logp)

    def sample(self, key, sample_shape=()):
        assert self.duration is not None
        T = self.duration
        S = self.initial_logits.shape[-1]
        k_init, k_trans, k_obs = jax.random.split(key, 3)
        shape = tuple(sample_shape) + self.batch_shape
        x0 = Categorical(
            logits=jnp.broadcast_to(self.initial_logits, shape + (S,))
        ).sample(k_init)
        trans = jnp.broadcast_to(
            self.transition_logits, shape + (T, S, S)
        )
        keys = jax.random.split(k_trans, T)

        def step(x, inputs):
            key_t, logits_t = inputs
            # logits_t: shape + (S, S); pick row x
            row = jnp.take_along_axis(
                logits_t, x[..., None, None], axis=-2
            )[..., 0, :]
            x_new = Categorical(logits=row).sample(key_t)
            return x_new, x_new

        trans_t = jnp.moveaxis(trans, len(shape), 0)
        _, xs = jax.lax.scan(step, x0, (keys, trans_t))
        xs = jnp.moveaxis(xs, 0, len(shape))  # shape + (T,)
        # sample observations for all states then gather
        obs = self.observation_dist.expand(
            self.batch_shape + (T, S)
        ).sample(k_obs, sample_shape)
        event_dim = self.observation_dist.event_dim
        idx = xs.reshape(xs.shape + (1,) * (event_dim + 1))
        gathered = jnp.take_along_axis(
            obs, idx, axis=-1 - event_dim
        )
        return jnp.squeeze(gathered, axis=-1 - event_dim)


class GaussianHMM(HiddenMarkovModel):
    """Ref ``hmm.py:434``."""

    arg_constraints = {}
    has_rsample = True
    support = constraints.independent(constraints.real, 2)

    def __init__(
        self,
        initial_dist,
        transition_matrix,
        transition_dist,
        observation_matrix,
        observation_dist,
        duration=None,
    ):
        hidden_dim, obs_dim = observation_matrix.shape[-2:]
        assert initial_dist.event_shape == (hidden_dim,)
        assert transition_matrix.shape[-2:] == (hidden_dim, hidden_dim)
        assert transition_dist.event_shape == (hidden_dim,)
        assert observation_dist.event_shape == (obs_dim,)
        shape = broadcast_shape(
            initial_dist.batch_shape + (1,),
            transition_matrix.shape[:-2],
            transition_dist.batch_shape,
            observation_matrix.shape[:-2],
            observation_dist.batch_shape,
        )
        batch_shape, time_shape = shape[:-1], shape[-1:]
        event_shape = tuple(time_shape) + (obs_dim,)
        super().__init__(duration, batch_shape, event_shape)
        self.hidden_dim = hidden_dim
        self.obs_dim = obs_dim
        self._init = mvn_to_gaussian(initial_dist).expand(self.batch_shape)
        self._trans = matrix_and_mvn_to_gaussian(
            transition_matrix, transition_dist
        )
        self._obs = matrix_and_mvn_to_gaussian(
            observation_matrix, observation_dist
        )

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        new = object.__new__(GaussianHMM)
        new.hidden_dim = self.hidden_dim
        new.obs_dim = self.obs_dim
        new._obs = self._obs
        new._trans = self._trans
        new._init = self._init.expand(batch_shape)
        Distribution.__init__(new, batch_shape, self.event_shape)
        new._duration = self._duration
        new._pyro_init_args = self._pyro_init_args
        return new

    def _validate_value(self, value):
        """Reference error semantics (see DiscreteHMM._validate_value)."""
        value = jnp.asarray(value)
        if value.ndim < 2:
            raise ValueError(
                f"value has too few dimensions: {value.shape}"
            )
        if value.shape[-1] != self.obs_dim:
            raise ValueError(
                "The right-most size of value must match event_shape: "
                f"{value.shape} vs {self.event_shape}"
            )
        t_model = self.event_shape[0]
        if t_model != 1 and value.shape[-2] != t_model:
            raise ValueError(
                "The right-most size of value must match event_shape: "
                f"{value.shape} vs {self.event_shape}"
            )
        broadcast_shape(value.shape[:-2], self.batch_shape)
        return value

    def log_prob(self, value):
        value = self._validate_value(value)
        result = self._trans + self._obs.condition(value).event_pad(
            left=self.hidden_dim
        )
        if result.precision.ndim == 2:
            # time-invariant transition/observation parameters: the data
            # enters only the info vectors, so every time step shares one
            # precision matrix — use the homogeneous fast path (one
            # factorization per halving level instead of a batched one)
            from ..ops.gaussian import (
                sequential_gaussian_tensordot_homogeneous,
            )

            result = sequential_gaussian_tensordot_homogeneous(result)
        else:
            result = result.expand(result.batch_shape)
            result = sequential_gaussian_tensordot(result)
        result = gaussian_tensordot(self._init, result, dims=self.hidden_dim)
        return result.event_logsumexp()

    def rsample(self, key, sample_shape=()):
        assert self.duration is not None
        k_z, k_x = jax.random.split(key)
        trans = self._trans + self._obs.marginalize(
            right=self.obs_dim
        ).event_pad(left=self.hidden_dim)
        if trans.precision.ndim == 2 and not self.batch_shape:
            from ..ops.gaussian import (
                Gaussian,
                sequential_gaussian_filter_sample_homogeneous,
            )

            T = self.duration
            trans_b = Gaussian(
                jnp.broadcast_to(trans.log_normalizer, (T,)),
                jnp.broadcast_to(
                    trans.info_vec, (T,) + trans.info_vec.shape[-1:]
                ),
                trans.precision,
            )
            z = sequential_gaussian_filter_sample_homogeneous(
                self._init, trans_b, sample_shape, rng_key=k_z
            )
        else:
            trans = trans.expand(
                broadcast_shape(
                    trans.batch_shape, self.batch_shape + (self.duration,)
                )
            )
            z = sequential_gaussian_filter_sample(
                self._init, trans, sample_shape, rng_key=k_z
            )
        z = z[..., 1:, :]  # drop the initial hidden state
        x = self._obs.left_condition(z).rsample(k_x)
        return x

    def rsample_posterior(self, value, key, sample_shape=()):
        """Sample latent states given observations (ref ``hmm.py:600``)."""
        value = self._validate_value(value)
        trans = self._trans + self._obs.condition(value).event_pad(
            left=self.hidden_dim
        )
        if trans.precision.ndim == 2:
            from ..ops.gaussian import (
                sequential_gaussian_filter_sample_homogeneous,
            )

            z = sequential_gaussian_filter_sample_homogeneous(
                self._init, trans, sample_shape, rng_key=key
            )
        else:
            trans = trans.expand(trans.batch_shape)
            z = sequential_gaussian_filter_sample(
                self._init, trans, sample_shape, rng_key=key
            )
        return z[..., 1:, :]

    def filter(self, value):
        """Posterior over the final hidden state (ref ``hmm.py:611``)."""
        logp = self._trans + self._obs.condition(value).event_pad(
            left=self.hidden_dim
        )
        logp = logp.expand(logp.batch_shape)
        logp = sequential_gaussian_tensordot(logp)
        logp = gaussian_tensordot(self._init, logp, dims=self.hidden_dim)
        # normalize to an MVN over the final state
        return logp.to_mvn()

    def _likelihood_to_gaussian(self, other):
        """Per-time-step likelihood Gaussian over obs_dim (batch
        ``(..., T)``) from an Independent Normal / MVN with event shape
        ``(T, obs_dim)``."""
        from .continuous import Normal
        from .distribution import Independent

        if isinstance(other, Independent):
            base = other.base_dist
            if isinstance(base, Normal):
                shape = tuple(other.batch_shape) + tuple(other.event_shape)
                loc = jnp.broadcast_to(base.loc, shape)
                scale = jnp.broadcast_to(base.scale, shape)
                return mvn_to_gaussian(Independent(Normal(loc, scale), 1))
            if hasattr(base, "scale_tril"):
                return mvn_to_gaussian(base)
        raise ValueError(
            "conjugate_update requires an Independent Normal or "
            "MultivariateNormal likelihood with event_shape "
            f"(T, obs_dim); got {type(other).__name__}"
        )

    def conjugate_update(self, other):
        """Fuse a compatible observation likelihood into this HMM
        (ref ``hmm.py:638``): returns ``(updated, log_normalizer)`` with

            f.log_prob(x) + g.log_prob(x)
                == fg.log_prob(x) + log_normalizer
        """
        duration = (
            other.event_shape[0] if self.duration is None else self.duration
        )
        assert tuple(other.event_shape) == (duration, self.obs_dim)

        new = object.__new__(GaussianHMM)
        new.hidden_dim = self.hidden_dim
        new.obs_dim = self.obs_dim
        new._init = self._init
        new._trans = self._trans
        new._obs = self._obs + self._likelihood_to_gaussian(other).event_pad(
            left=self.hidden_dim
        )

        # normalize: the updated init absorbs -log Z so the result is a
        # proper distribution over observations
        logp = new._trans + new._obs.marginalize(right=new.obs_dim).event_pad(
            left=new.hidden_dim
        )
        logp = sequential_gaussian_tensordot(logp.expand(logp.batch_shape))
        logp = gaussian_tensordot(new._init, logp, dims=new.hidden_dim)
        log_normalizer = logp.event_logsumexp()
        new._init = new._init - log_normalizer

        Distribution.__init__(
            new, jnp.shape(log_normalizer), (duration, self.obs_dim)
        )
        new._duration = duration
        new._pyro_init_args = self._pyro_init_args
        return new, log_normalizer

    def prefix_condition(self, data):
        """Condition on the first ``t`` observed steps and return the
        posterior predictive HMM over the remaining ``f = duration - t``
        steps (ref ``hmm.py:690``; the forecasting primitive)."""
        assert data.ndim >= 2
        assert data.shape[-1] == self.event_shape[-1]
        assert data.shape[-2] < self.duration
        t = data.shape[-2]
        f = self.duration - t

        left = object.__new__(GaussianHMM)
        left.hidden_dim = self.hidden_dim
        left.obs_dim = self.obs_dim
        left._init = self._init
        right = object.__new__(GaussianHMM)
        right.hidden_dim = self.hidden_dim
        right.obs_dim = self.obs_dim

        # homogeneous factors are shared; heterogeneous ones split in time
        if self._obs.batch_shape == () or self._obs.batch_shape[-1] == 1:
            left._obs = right._obs = self._obs
        else:
            left._obs = self._obs[..., :t]
            right._obs = self._obs[..., t:]
        if self._trans.batch_shape == () or self._trans.batch_shape[-1] == 1:
            left._trans = right._trans = self._trans
        else:
            left._trans = self._trans[..., :t]
            right._trans = self._trans[..., t:]

        Distribution.__init__(left, self.batch_shape, (t, self.obs_dim))
        left._duration = t
        left._pyro_init_args = self._pyro_init_args
        initial_dist = left.filter(data)

        right._init = mvn_to_gaussian(initial_dist)
        batch_shape = broadcast_shape(
            right._init.batch_shape, self.batch_shape
        )
        Distribution.__init__(right, batch_shape, (f, self.obs_dim))
        right._duration = f
        right._pyro_init_args = self._pyro_init_args
        return right

    @property
    def mean(self):
        raise NotImplementedError

    @property
    def variance(self):
        raise NotImplementedError


class GammaGaussianHMM(HiddenMarkovModel):
    """HMM whose joint over (init, hidden, observed) states is multivariate
    Student-T via a shared Gamma-distributed precision multiplier
    (ref ``hmm.py:744``; Särkkä & García-Fernández 2019 for the O(log T)
    parallelization):

        s ~ Gamma(df/2, df/2)
        z ~ scale(initial_dist, s)
        repeat:  z' = z @ A + scale(trans_dist, s);  x = z @ C + scale(obs_dist, s)

    where ``scale(mvn(loc, P), s) = mvn(loc, s * P)``.  Time elimination is
    a pairwise ``gamma_gaussian_tensordot`` halving on the MXU.
    """

    arg_constraints = {}
    support = constraints.independent(constraints.real, 2)

    def __init__(
        self,
        scale_dist,
        initial_dist,
        transition_matrix,
        transition_dist,
        observation_matrix,
        observation_dist,
        duration=None,
    ):
        from ..ops.gamma_gaussian import (
            gamma_and_mvn_to_gamma_gaussian,
            matrix_and_mvn_to_gamma_gaussian,
        )

        hidden_dim, obs_dim = observation_matrix.shape[-2:]
        assert initial_dist.event_shape == (hidden_dim,)
        assert transition_matrix.shape[-2:] == (hidden_dim, hidden_dim)
        assert transition_dist.event_shape == (hidden_dim,)
        assert observation_dist.event_shape == (obs_dim,)
        shape = broadcast_shape(
            scale_dist.batch_shape + (1,),
            initial_dist.batch_shape + (1,),
            transition_matrix.shape[:-2],
            transition_dist.batch_shape,
            observation_matrix.shape[:-2],
            observation_dist.batch_shape,
        )
        batch_shape, time_shape = shape[:-1], shape[-1:]
        event_shape = tuple(time_shape) + (obs_dim,)
        super().__init__(duration, batch_shape, event_shape)
        self.hidden_dim = hidden_dim
        self.obs_dim = obs_dim
        self._init = gamma_and_mvn_to_gamma_gaussian(
            scale_dist, initial_dist
        ).expand(self.batch_shape)
        self._trans = matrix_and_mvn_to_gamma_gaussian(
            transition_matrix, transition_dist
        )
        self._obs = matrix_and_mvn_to_gamma_gaussian(
            observation_matrix, observation_dist
        )

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        new = object.__new__(GammaGaussianHMM)
        new.hidden_dim = self.hidden_dim
        new.obs_dim = self.obs_dim
        new._obs = self._obs
        new._trans = self._trans
        new._init = self._init.expand(batch_shape)
        Distribution.__init__(new, batch_shape, self.event_shape)
        new._duration = self._duration
        new._pyro_init_args = self._pyro_init_args
        return new

    def log_prob(self, value):
        from ..ops.gamma_gaussian import (
            gamma_gaussian_tensordot,
            sequential_gamma_gaussian_tensordot,
        )

        result = self._trans + self._obs.condition(value).event_pad(
            left=self.hidden_dim
        )
        if result.precision.ndim == 2:
            # shared precision across time: homogeneous fast path
            from ..ops.gamma_gaussian import (
                sequential_gamma_gaussian_tensordot_homogeneous,
            )

            result = sequential_gamma_gaussian_tensordot_homogeneous(
                result
            )
        else:
            result = result.expand(result.batch_shape)
            result = sequential_gamma_gaussian_tensordot(result)
        result = gamma_gaussian_tensordot(
            self._init, result, dims=self.hidden_dim
        )
        return result.event_logsumexp().logsumexp()

    def filter(self, value):
        """Posterior over (mixing variable, final hidden state) given
        observations, as a (Gamma, MultivariateNormal) pair with the MVN
        conditioned on unit scale (ref ``hmm.py:903``)."""
        from ..ops.gamma_gaussian import (
            gamma_gaussian_tensordot,
            sequential_gamma_gaussian_tensordot,
        )
        from .continuous import Gamma as GammaDist
        from .multivariate import MultivariateNormal

        logp = self._trans + self._obs.condition(value).event_pad(
            left=self.hidden_dim
        )
        logp = logp.expand(logp.batch_shape)
        logp = sequential_gamma_gaussian_tensordot(logp)
        logp = gamma_gaussian_tensordot(
            self._init, logp, dims=self.hidden_dim
        )
        gamma_dist = logp.event_logsumexp()
        scale_post = GammaDist(gamma_dist.concentration, gamma_dist.rate)
        mvn = Gaussian(
            jnp.zeros(logp.batch_shape), logp.info_vec, logp.precision
        ).to_mvn()
        return scale_post, mvn

    @property
    def mean(self):
        raise NotImplementedError

    @property
    def variance(self):
        raise NotImplementedError


class IndependentHMM(HiddenMarkovModel):
    """Run independent base HMMs over the rightmost batch dim, giving an
    event dim over channels (ref ``hmm.py:1141``)."""

    arg_constraints = {}

    def __init__(self, base_dist: HiddenMarkovModel):
        if base_dist.event_shape[-1] != 1:
            raise ValueError(
                "IndependentHMM requires a base with obs_dim=1"
            )
        self.base_dist = base_dist
        batch_shape = base_dist.batch_shape[:-1]
        num_channels = (
            base_dist.batch_shape[-1] if base_dist.batch_shape else 1
        )
        event_shape = (base_dist.event_shape[0], num_channels)
        super().__init__(base_dist.duration, batch_shape, event_shape)

    @property
    def has_rsample(self):  # type: ignore[override]
        return self.base_dist.has_rsample

    @property
    def support(self):  # type: ignore[override]
        return constraints.independent(constraints.real, 2)

    def _to_base(self, value):
        # (..., T, C) -> (..., C, T, 1)
        return jnp.moveaxis(value, -1, -2)[..., None]

    def log_prob(self, value):
        base_value = self._to_base(value)
        lp = self.base_dist.log_prob(base_value)  # (..., C)
        return jnp.sum(lp, axis=-1)

    def rsample(self, key, sample_shape=()):
        x = self.base_dist.rsample(key, sample_shape)  # (..., C, T, 1)
        return jnp.moveaxis(x[..., 0], -2, -1)  # -> (..., T, C)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        C = self.event_shape[-1]
        return IndependentHMM(self.base_dist.expand(batch_shape + (C,)))


class LinearHMM(HiddenMarkovModel):
    """HMM with linear dynamics and arbitrarily-distributed noise
    (ref ``hmm.py:939``): supports heavy-tailed (Stable, StudentT) and
    transformed noise.  ``log_prob`` is intractable — reparameterize with
    ``pyro_tpu.infer.reparam.LinearHMMReparam``, which rewrites the site
    into a tractable GaussianHMM plus auxiliary noise sites.
    """

    arg_constraints = {}
    has_rsample = True
    support = constraints.independent(constraints.real, 2)

    def __init__(
        self,
        initial_dist,
        transition_matrix,
        transition_dist,
        observation_matrix,
        observation_dist,
        duration=None,
    ):
        hidden_dim, obs_dim = observation_matrix.shape[-2:]
        self.hidden_dim = hidden_dim
        self.obs_dim = obs_dim
        shape = broadcast_shape(
            initial_dist.batch_shape + (1,),
            transition_matrix.shape[:-2],
            transition_dist.batch_shape,
            observation_matrix.shape[:-2],
            observation_dist.batch_shape,
        )
        batch_shape, time_shape = shape[:-1], shape[-1:]
        event_shape = tuple(time_shape) + (obs_dim,)
        super().__init__(duration, batch_shape, event_shape)
        self.initial_dist = initial_dist
        self.transition_matrix = transition_matrix
        self.transition_dist = transition_dist
        self.observation_matrix = observation_matrix
        self.observation_dist = observation_dist
        # unpack observation transforms (for LinearHMMReparam)
        from .distribution import TransformedDistribution

        self.transforms = []
        obs_base = observation_dist
        if isinstance(obs_base, TransformedDistribution):
            self.transforms = obs_base.transforms
            self.observation_dist = obs_base.base_dist

    def log_prob(self, value):
        raise NotImplementedError(
            "LinearHMM.log_prob is intractable; use LinearHMMReparam"
        )

    def rsample(self, key, sample_shape=()):
        assert self.duration is not None
        T = self.duration
        ks = jax.random.split(key, 4)
        init = self.initial_dist.rsample(
            ks[0], tuple(sample_shape) + self.batch_shape
        )
        trans_shape = (
            tuple(sample_shape) + self.batch_shape + (T,)
        )
        trans_noise = self.transition_dist.expand(
            broadcast_shape(self.transition_dist.batch_shape, (T,))
        ).rsample(ks[1], tuple(sample_shape) + self.batch_shape)
        obs_noise = self.observation_dist.expand(
            broadcast_shape(self.observation_dist.batch_shape, (T,))
        ).rsample(ks[2], tuple(sample_shape) + self.batch_shape)
        tm = jnp.broadcast_to(
            self.transition_matrix,
            broadcast_shape(self.transition_matrix.shape[:-2], (T,))
            + self.transition_matrix.shape[-2:],
        )
        om = jnp.broadcast_to(
            self.observation_matrix,
            broadcast_shape(self.observation_matrix.shape[:-2], (T,))
            + self.observation_matrix.shape[-2:],
        )

        def step(z, inputs):
            tm_t, om_t, tn_t, on_t = inputs
            z = jnp.einsum("...i,...ij->...j", z, tm_t) + tn_t
            x = jnp.einsum("...i,...ij->...j", z, om_t) + on_t
            return z, x

        tn = jnp.moveaxis(trans_noise, -2, 0)
        on = jnp.moveaxis(obs_noise, -2, 0)
        tm_t = jnp.moveaxis(tm, -3, 0) if tm.ndim > 2 else jnp.broadcast_to(tm, (T,) + tm.shape[-2:])
        om_t = jnp.moveaxis(om, -3, 0) if om.ndim > 2 else jnp.broadcast_to(om, (T,) + om.shape[-2:])
        _, xs = jax.lax.scan(step, init, (tm_t, om_t, tn, on))
        x = jnp.moveaxis(xs, 0, -2)
        for t in self.transforms:
            x = t(x)
        return x

    def expand(self, batch_shape, _instance=None):
        raise NotImplementedError(
            "expand LinearHMM via LinearHMMReparam instead"
        )


class GaussianMRF(Distribution):
    """Temporal Gaussian Markov random field (ref ``hmm.py:1201``)."""

    arg_constraints = {}
    support = constraints.independent(constraints.real, 2)

    def __init__(self, initial_dist, transition_dist, observation_dist, duration=None):
        assert initial_dist.event_dim == 1
        assert transition_dist.event_dim == 1
        assert observation_dist.event_dim == 1
        hidden_dim = initial_dist.event_shape[0]
        obs_dim = observation_dist.event_shape[0] - hidden_dim
        assert obs_dim > 0
        shape = broadcast_shape(
            initial_dist.batch_shape + (1,),
            transition_dist.batch_shape,
            observation_dist.batch_shape,
        )
        batch_shape, time_shape = shape[:-1], shape[-1:]
        event_shape = tuple(time_shape) + (obs_dim,)
        self.hidden_dim = hidden_dim
        self.obs_dim = obs_dim
        self._init = mvn_to_gaussian(initial_dist)
        self._trans = mvn_to_gaussian(transition_dist)
        self._obs = mvn_to_gaussian(observation_dist)
        Distribution.__init__(self, batch_shape, event_shape)
        self._duration = duration

    @property
    def duration(self):
        return self._duration

    def log_prob(self, value):
        # log p(value) = logZ(joint conditioned on obs) - logZ(hidden-only)
        logp_oh = self._trans + self._obs.condition(value).event_pad(
            left=self.hidden_dim
        )
        logp_h = self._trans + self._obs.marginalize(
            right=self.obs_dim
        ).event_pad(left=self.hidden_dim)
        logp_oh = sequential_gaussian_tensordot(
            logp_oh.expand(logp_oh.batch_shape)
        )
        logp_h = sequential_gaussian_tensordot(
            logp_h.expand(logp_h.batch_shape)
        )
        logp_oh = gaussian_tensordot(
            self._init, logp_oh, dims=self.hidden_dim
        )
        logp_h = gaussian_tensordot(
            self._init, logp_h, dims=self.hidden_dim
        )
        return logp_oh.event_logsumexp() - logp_h.event_logsumexp()
