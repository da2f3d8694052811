"""MuE sequence models: ProfileHMM and FactorMuE.

Ref ``pyro/contrib/mue/models.py``: ``ProfileHMM:26`` (delta-function
regressor + MuE observation), ``FactorMuE:325`` (probabilistic PCA +
MuE output), after Weinstein & Marks (2021).

TPU notes: training steps compile to single XLA programs through
``SVI.step``; minibatches keep a fixed shape (the last partial batch is
dropped) so each epoch reuses one compiled program.  The amortized
encoder is an explicit linear map held in the param store rather than a
torch ``nn.Module``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from ... import poutine
from ...infer import SVI, Trace_ELBO
from ...optim import Adam
from .missingdatahmm import MissingDataDiscreteHMM
from .statearrangers import Profile

softplus = jax.nn.softplus


class ProfileHMM:
    """Ref ``models.py:26``.  Normal priors pushed through log-softmax
    onto the simplex; MissingDataDiscreteHMM likelihood."""

    def __init__(
        self,
        latent_seq_length,
        alphabet_length,
        prior_scale=1.0,
        indel_prior_bias=10.0,
    ):
        assert isinstance(latent_seq_length, int) and latent_seq_length > 0
        assert isinstance(alphabet_length, int) and alphabet_length > 0
        self.latent_seq_length = latent_seq_length
        self.alphabet_length = alphabet_length
        self.precursor_seq_shape = (latent_seq_length, alphabet_length)
        self.insert_seq_shape = (latent_seq_length + 1, alphabet_length)
        self.indel_shape = (latent_seq_length, 3, 2)
        self.prior_scale = float(prior_scale)
        self.indel_prior = jnp.array([float(indel_prior_bias), 0.0])
        self.statearrange = Profile(latent_seq_length)

    def model(self, seq_data, local_scale):
        from jax.scipy.special import logsumexp

        precursor_seq = pyro.sample(
            "precursor_seq",
            dist.Normal(
                jnp.zeros(self.precursor_seq_shape), self.prior_scale
            ).to_event(2),
        )
        precursor_seq_logits = precursor_seq - logsumexp(
            precursor_seq, -1, keepdims=True
        )
        insert_seq = pyro.sample(
            "insert_seq",
            dist.Normal(
                jnp.zeros(self.insert_seq_shape), self.prior_scale
            ).to_event(2),
        )
        insert_seq_logits = insert_seq - logsumexp(
            insert_seq, -1, keepdims=True
        )
        insert = pyro.sample(
            "insert",
            dist.Normal(
                self.indel_prior * jnp.ones(self.indel_shape),
                self.prior_scale,
            ).to_event(3),
        )
        insert_logits = insert - logsumexp(insert, -1, keepdims=True)
        delete = pyro.sample(
            "delete",
            dist.Normal(
                self.indel_prior * jnp.ones(self.indel_shape),
                self.prior_scale,
            ).to_event(3),
        )
        delete_logits = delete - logsumexp(delete, -1, keepdims=True)

        initial_logits, transition_logits, observation_logits = (
            self.statearrange(
                precursor_seq_logits,
                insert_seq_logits,
                insert_logits,
                delete_logits,
            )
        )
        with pyro.plate("batch", seq_data.shape[0]):
            with poutine.scale(scale=local_scale):
                pyro.sample(
                    "obs_seq",
                    MissingDataDiscreteHMM(
                        initial_logits,
                        transition_logits,
                        observation_logits,
                    ),
                    obs=seq_data,
                )

    def guide(self, seq_data, local_scale):
        for name, shape, mn_init in [
            ("precursor_seq", self.precursor_seq_shape, 0.0),
            ("insert_seq", self.insert_seq_shape, 0.0),
            ("insert", self.indel_shape, None),
            ("delete", self.indel_shape, None),
        ]:
            if mn_init is None:
                init = self.indel_prior * jnp.ones(shape)
            else:
                init = jnp.full(shape, mn_init)
            q_mn = pyro.param(f"{name}_q_mn", init)
            q_sd = pyro.param(f"{name}_q_sd", jnp.zeros(shape))
            pyro.sample(
                name,
                dist.Normal(q_mn, softplus(q_sd)).to_event(len(shape)),
            )

    def fit_svi(
        self,
        dataset,
        epochs=2,
        batch_size=1,
        learning_rate=0.01,
        rng=0,
    ):
        """SVI training (ref ``models.py:173``); each epoch reuses one
        compiled step (fixed batch shape; last partial batch dropped)."""
        svi = SVI(
            self.model, self.guide, Adam({"lr": learning_rate}), Trace_ELBO()
        )
        n = len(dataset)
        losses = []
        for epoch in range(epochs):
            for seq_data, L_data in dataset.batches(
                batch_size, rng=rng + epoch
            ):
                if seq_data.shape[0] != batch_size:
                    continue
                loss = svi.step(
                    seq_data, jnp.asarray(n / seq_data.shape[0])
                )
                losses.append(loss)
        self._svi = svi
        return losses

    def evaluate(self, dataset_train, dataset_test=None):
        """Log probability and per-residue perplexity (ref :242)."""
        train_lp, train_perplex = self._evaluate_local_elbo(dataset_train)
        if dataset_test is not None:
            test_lp, test_perplex = self._evaluate_local_elbo(dataset_test)
            return train_lp, test_lp, train_perplex, test_perplex
        return train_lp, None, train_perplex, None

    def _local_variables(self, name, site):
        return name in ["obs_L", "obs_seq"]

    def _evaluate_local_elbo(self, dataset):
        lp, perplex = 0.0, 0.0
        for i in range(len(dataset)):
            seq_data, L = dataset[i]
            seq_data = seq_data[None]
            args = (seq_data, jnp.asarray(1.0))
            guide_tr = poutine.trace(
                poutine.seed(self.guide, jax.random.key(i))
            ).get_trace(*args)
            model_tr = poutine.trace(
                poutine.replay(
                    poutine.seed(self.model, jax.random.key(i)),
                    trace=guide_tr,
                )
            ).get_trace(*args)
            local_elbo = float(
                model_tr.log_prob_sum(self._local_variables)
                - guide_tr.log_prob_sum(self._local_variables)
            )
            lp += local_elbo
            perplex += -local_elbo / float(L)
        perplex = float(np.exp(perplex / len(dataset)))
        return lp, perplex


class FactorMuE:
    """Probabilistic PCA + MuE output (ref ``models.py:325``).  The
    amortized encoder is a linear map stored as pyro params."""

    def __init__(
        self,
        data_length,
        alphabet_length,
        z_dim,
        batch_size=10,
        latent_seq_length=None,
        indel_factor_dependence=False,
        indel_prior_scale=1.0,
        indel_prior_bias=10.0,
        inverse_temp_prior=100.0,
        weights_prior_scale=1.0,
        offset_prior_scale=1.0,
        z_prior_distribution="Normal",
        ARD_prior=False,
        substitution_matrix=True,
        substitution_prior_scale=10.0,
        latent_alphabet_length=None,
        epsilon=1e-32,
    ):
        self.data_length = data_length
        if latent_seq_length is None:
            latent_seq_length = int(data_length * 1.1)
        self.latent_seq_length = latent_seq_length
        self.alphabet_length = alphabet_length
        self.z_dim = z_dim
        if (not substitution_matrix) or (latent_alphabet_length is None):
            latent_alphabet_length = alphabet_length
        self.latent_alphabet_length = latent_alphabet_length
        self.indel_shape = (latent_seq_length, 3, 2)
        self.total_factor_size = (
            2 * latent_seq_length + 1
        ) * latent_alphabet_length + (
            2 * int(indel_factor_dependence) * latent_seq_length * 3 * 2
        )
        self.indel_factor_dependence = indel_factor_dependence
        self.ARD_prior = ARD_prior
        self.substitution_matrix = substitution_matrix
        self.indel_prior_scale = float(indel_prior_scale)
        self.indel_prior = jnp.array([float(indel_prior_bias), 0.0])
        self.inverse_temp_prior = float(inverse_temp_prior)
        self.weights_prior_scale = float(weights_prior_scale)
        self.offset_prior_scale = float(offset_prior_scale)
        self.substitution_prior_scale = float(substitution_prior_scale)
        self.z_prior_distribution = z_prior_distribution
        self.epsilon = float(epsilon)
        self.batch_size = batch_size
        self.statearrange = Profile(latent_seq_length)

    # -- pPCA decoder ------------------------------------------------------
    def decoder(self, z, W, B, inverse_temp):
        """Ref ``models.py:452``."""
        from jax.scipy.special import logsumexp

        v = z @ W + B
        out = {}
        M, D = self.latent_seq_length, self.latent_alphabet_length
        if self.indel_factor_dependence:
            ind0 = (2 * M + 1) * D
            ind1 = ind0 + M * 3 * 2
            ind2 = ind1 + M * 3 * 2
            insert_v = (
                v[:, ind0:ind1].reshape((-1, M, 3, 2)) + self.indel_prior
            )
            out["insert_logits"] = insert_v - logsumexp(
                insert_v, -1, keepdims=True
            )
            delete_v = (
                v[:, ind1:ind2].reshape((-1, M, 3, 2)) + self.indel_prior
            )
            out["delete_logits"] = delete_v - logsumexp(
                delete_v, -1, keepdims=True
            )
        ind0 = M * D
        ind1 = ind0 + (M + 1) * D
        precursor_seq_v = (v[:, :ind0] * softplus(inverse_temp)).reshape(
            (-1, M, D)
        )
        out["precursor_seq_logits"] = precursor_seq_v - logsumexp(
            precursor_seq_v, -1, keepdims=True
        )
        insert_seq_v = (v[:, ind0:ind1] * softplus(inverse_temp)).reshape(
            (-1, M + 1, D)
        )
        out["insert_seq_logits"] = insert_seq_v - logsumexp(
            insert_seq_v, -1, keepdims=True
        )
        return out

    def model(self, seq_data, local_scale, local_prior_scale):
        from jax.scipy.special import logsumexp

        if self.ARD_prior:
            alpha = pyro.sample(
                "alpha",
                dist.Gamma(
                    jnp.ones(self.z_dim), jnp.ones(self.z_dim)
                ).to_event(1),
            )
        else:
            alpha = jnp.ones(self.z_dim)

        W = pyro.sample(
            "W",
            dist.Normal(
                jnp.zeros((self.z_dim, self.total_factor_size)),
                self.weights_prior_scale
                / (alpha[:, None] + self.epsilon)
                * jnp.ones((self.z_dim, self.total_factor_size)),
            ).to_event(2),
        )
        B = pyro.sample(
            "B",
            dist.Normal(
                jnp.zeros(self.total_factor_size),
                self.offset_prior_scale,
            ).to_event(1),
        )

        if not self.indel_factor_dependence:
            insert = pyro.sample(
                "insert",
                dist.Normal(
                    self.indel_prior * jnp.ones(self.indel_shape),
                    self.indel_prior_scale,
                ).to_event(3),
            )
            insert_logits = insert - logsumexp(insert, -1, keepdims=True)
            delete = pyro.sample(
                "delete",
                dist.Normal(
                    self.indel_prior * jnp.ones(self.indel_shape),
                    self.indel_prior_scale,
                ).to_event(3),
            )
            delete_logits = delete - logsumexp(delete, -1, keepdims=True)

        inverse_temp = pyro.sample(
            "inverse_temp", dist.Normal(self.inverse_temp_prior, 1.0)
        )

        substitute = None
        if self.substitution_matrix:
            substitute = pyro.sample(
                "substitute",
                dist.Normal(
                    jnp.zeros(
                        (self.latent_alphabet_length, self.alphabet_length)
                    ),
                    self.substitution_prior_scale,
                ).to_event(2),
            )

        with pyro.plate("batch", seq_data.shape[0]):
            with poutine.scale(scale=local_scale):
                with poutine.scale(scale=local_prior_scale):
                    zdist = (
                        dist.Normal
                        if self.z_prior_distribution == "Normal"
                        else dist.Laplace
                    )
                    z = pyro.sample(
                        "latent",
                        zdist(
                            jnp.zeros(self.z_dim), jnp.ones(self.z_dim)
                        ).to_event(1),
                    )

                decoded = self.decoder(z, W, B, inverse_temp)
                if self.indel_factor_dependence:
                    insert_logits = decoded["insert_logits"]
                    delete_logits = decoded["delete_logits"]
                initial_logits, transition_logits, observation_logits = (
                    self.statearrange(
                        decoded["precursor_seq_logits"],
                        decoded["insert_seq_logits"],
                        insert_logits,
                        delete_logits,
                        substitute,
                    )
                )
                pyro.sample(
                    "obs_seq",
                    MissingDataDiscreteHMM(
                        initial_logits,
                        transition_logits,
                        observation_logits,
                    ),
                    obs=seq_data,
                )

    def _encode(self, seq_data):
        """Amortized linear encoder held in the param store (replaces the
        reference's torch ``Encoder`` module, ref ``models.py:309``)."""
        input_size = self.data_length * self.alphabet_length
        rs = np.random.RandomState(0)
        W_mn = pyro.param(
            "encoder_W_mn",
            jnp.asarray(
                rs.randn(input_size, self.z_dim) * 0.01, jnp.float32
            ),
        )
        b_mn = pyro.param("encoder_b_mn", jnp.zeros(self.z_dim))
        W_sd = pyro.param(
            "encoder_W_sd",
            jnp.asarray(
                rs.randn(input_size, self.z_dim) * 0.01, jnp.float32
            ),
        )
        b_sd = pyro.param("encoder_b_sd", jnp.zeros(self.z_dim))
        flat = seq_data.reshape((-1, input_size))
        z_loc = flat @ W_mn + b_mn
        z_scale = softplus(flat @ W_sd + b_sd)
        return z_loc, z_scale

    def guide(self, seq_data, local_scale, local_prior_scale):
        if self.ARD_prior:
            alpha_conc = pyro.param("alpha_conc", jnp.zeros(self.z_dim))
            alpha_rate = pyro.param("alpha_rate", jnp.zeros(self.z_dim))
            pyro.sample(
                "alpha",
                dist.Gamma(
                    softplus(alpha_conc), softplus(alpha_rate)
                ).to_event(1),
            )
        rs = np.random.RandomState(1)
        W_q_mn = pyro.param(
            "W_q_mn",
            jnp.asarray(
                rs.randn(self.z_dim, self.total_factor_size) * 0.1,
                jnp.float32,
            ),
        )
        W_q_sd = pyro.param(
            "W_q_sd", jnp.ones((self.z_dim, self.total_factor_size))
        )
        pyro.sample(
            "W", dist.Normal(W_q_mn, softplus(W_q_sd)).to_event(2)
        )
        B_q_mn = pyro.param(
            "B_q_mn",
            jnp.asarray(
                rs.randn(self.total_factor_size) * 0.1, jnp.float32
            ),
        )
        B_q_sd = pyro.param("B_q_sd", jnp.ones(self.total_factor_size))
        pyro.sample(
            "B", dist.Normal(B_q_mn, softplus(B_q_sd)).to_event(1)
        )

        if not self.indel_factor_dependence:
            insert_q_mn = pyro.param(
                "insert_q_mn", self.indel_prior * jnp.ones(self.indel_shape)
            )
            insert_q_sd = pyro.param(
                "insert_q_sd", jnp.zeros(self.indel_shape)
            )
            pyro.sample(
                "insert",
                dist.Normal(insert_q_mn, softplus(insert_q_sd)).to_event(3),
            )
            delete_q_mn = pyro.param(
                "delete_q_mn", self.indel_prior * jnp.ones(self.indel_shape)
            )
            delete_q_sd = pyro.param(
                "delete_q_sd", jnp.zeros(self.indel_shape)
            )
            pyro.sample(
                "delete",
                dist.Normal(delete_q_mn, softplus(delete_q_sd)).to_event(3),
            )

        inverse_temp_q_mn = pyro.param("inverse_temp_q_mn", jnp.asarray(0.0))
        inverse_temp_q_sd = pyro.param("inverse_temp_q_sd", jnp.asarray(0.0))
        pyro.sample(
            "inverse_temp",
            dist.Normal(inverse_temp_q_mn, softplus(inverse_temp_q_sd)),
        )

        if self.substitution_matrix:
            sub_shape = (self.latent_alphabet_length, self.alphabet_length)
            substitute_q_mn = pyro.param(
                "substitute_q_mn", jnp.zeros(sub_shape)
            )
            substitute_q_sd = pyro.param(
                "substitute_q_sd", jnp.zeros(sub_shape)
            )
            pyro.sample(
                "substitute",
                dist.Normal(
                    substitute_q_mn, softplus(substitute_q_sd)
                ).to_event(2),
            )

        with pyro.plate("batch", seq_data.shape[0]):
            z_loc, z_scale = self._encode(seq_data)
            with poutine.scale(scale=local_scale * local_prior_scale):
                zdist = (
                    dist.Normal
                    if self.z_prior_distribution == "Normal"
                    else dist.Laplace
                )
                pyro.sample("latent", zdist(z_loc, z_scale).to_event(1))

    def _beta_anneal(self, step, batch_size, data_size, anneal_length):
        """KL annealing schedule (ref ``models.py:763``)."""
        if anneal_length <= 0:
            return 1.0
        anneal_frac = step * batch_size / (anneal_length * data_size)
        return float(min(anneal_frac, 1.0))

    def fit_svi(
        self,
        dataset,
        epochs=2,
        anneal_length=1.0,
        batch_size=None,
        learning_rate=0.01,
        rng=0,
    ):
        """Ref ``models.py:681``."""
        if batch_size is not None:
            self.batch_size = batch_size
        svi = SVI(
            self.model, self.guide, Adam({"lr": learning_rate}), Trace_ELBO()
        )
        n = len(dataset)
        losses = []
        step_i = 0
        for epoch in range(epochs):
            for seq_data, L_data in dataset.batches(
                self.batch_size, rng=rng + epoch
            ):
                if seq_data.shape[0] != self.batch_size:
                    continue
                beta = self._beta_anneal(
                    step_i, self.batch_size, n, anneal_length
                )
                loss = svi.step(
                    seq_data,
                    jnp.asarray(n / seq_data.shape[0]),
                    jnp.asarray(beta),
                )
                losses.append(loss)
                step_i += 1
        self._svi = svi
        return losses

    def evaluate(self, dataset_train, dataset_test=None):
        """Ref ``models.py:770``."""
        train_lp, train_perplex = self._evaluate_local_elbo(dataset_train)
        if dataset_test is not None:
            test_lp, test_perplex = self._evaluate_local_elbo(dataset_test)
            return train_lp, test_lp, train_perplex, test_perplex
        return train_lp, None, train_perplex, None

    def _local_variables(self, name, site):
        return name in ["latent", "obs_L", "obs_seq"]

    def _evaluate_local_elbo(self, dataset):
        lp, perplex = 0.0, 0.0
        for i in range(len(dataset)):
            seq_data, L = dataset[i]
            seq_data = seq_data[None]
            args = (seq_data, jnp.asarray(1.0), jnp.asarray(1.0))
            guide_tr = poutine.trace(
                poutine.seed(self.guide, jax.random.key(i))
            ).get_trace(*args)
            model_tr = poutine.trace(
                poutine.replay(
                    poutine.seed(self.model, jax.random.key(i)),
                    trace=guide_tr,
                )
            ).get_trace(*args)
            local_elbo = float(
                model_tr.log_prob_sum(self._local_variables)
                - guide_tr.log_prob_sum(self._local_variables)
            )
            lp += local_elbo
            perplex += -local_elbo / float(L)
        perplex = float(np.exp(perplex / len(dataset)))
        return lp, perplex

    def embed(self, dataset, batch_size=None):
        """Posterior mean embedding of each sequence (ref ``models.py:841``)."""
        z_loc, z_scale = self._encode(dataset.seq_data)
        return z_loc, z_scale
