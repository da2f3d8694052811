"""SVI convergence on conjugate Gaussian chains with analytic posteriors.

Mirrors the reference's
``tests/integration_tests/test_conjugate_gaussian_models.py``: an
N-latent chain of Normals whose posterior means, precisions and
inter-site regression coefficients (kappas) are known in closed form;
SVI with TraceGraph_ELBO must drive the variational parameters onto the
analytic targets, in both the reparameterized and the score-function
(fakes.NonreparameterizedNormal + decaying-average baseline) regimes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions.testing import fakes
from pyro_tpu.infer import SVI, TraceGraph_ELBO
from pyro_tpu.optim import Adam

pytestmark = pytest.mark.stage("integration")


class Chain:
    def __init__(self, N, difficulty, seed=0):
        self.N = N
        self.loc0 = jnp.asarray([0.2])
        self.data = jnp.asarray([-0.1, 0.03, 0.20, 0.10])
        self.n_data = self.data.shape[0]
        lambdas = [1.5 * (k + 1) / N for k in range(N + 1)]
        self.lambdas = [jnp.asarray([x]) for x in lambdas]
        # analytic posterior recursion (ref
        # test_conjugate_gaussian_models.py:40-72)
        lt = [self.lambdas[0]]
        for k in range(1, N):
            lt.append(
                self.lambdas[k] * lt[k - 1] / (self.lambdas[k] + lt[k - 1])
            )
        self.lambda_posts = [None]
        for k in range(1, N):
            self.lambda_posts.append(self.lambdas[k] + lt[k - 1])
        lambda_N_post = self.n_data * self.lambdas[N] + lt[N - 1]
        self.lambda_posts.append(lambda_N_post)
        self.target_kappas = [None] + [
            self.lambdas[k] / self.lambda_posts[k] for k in range(1, N)
        ]
        self.target_mus = [None] + [
            self.loc0 * lt[k - 1] / self.lambda_posts[k]
            for k in range(1, N)
        ]
        self.target_mus.append(
            self.data.sum() * self.lambdas[N] / lambda_N_post
            + self.loc0 * lt[N - 1] / lambda_N_post
        )
        key = jax.random.key(seed)
        ks = jax.random.split(key, 2 * N + N)
        self.init_noise = [
            difficulty * (0.1 * jax.random.normal(k, (1,)) - 0.53)
            for k in ks
        ]

    def model(self):
        # NOTE: like the reference, the (1,)-shaped latents stay batch
        # dims (no .to_event) — to_event(1) here would leak the event
        # dim into the obs batch and misalign the particle plate.
        next_mean = self.loc0
        for k in range(1, self.N + 1):
            loc_latent = pyro.sample(
                f"loc_latent_{k}",
                dist.Normal(next_mean, self.lambdas[k - 1] ** -0.5),
            )
            next_mean = loc_latent
        with pyro.plate("data", self.n_data):
            pyro.sample(
                "obs",
                dist.Normal(next_mean, self.lambdas[self.N] ** -0.5),
                obs=self.data,
            )

    def guide(self, reparameterized):
        Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal
        previous_sample = None
        noise = iter(self.init_noise)
        for k in reversed(range(1, self.N + 1)):
            loc_q = pyro.param(
                f"loc_q_{k}", self.target_mus[k] + next(noise)
            )
            log_sig_q = pyro.param(
                f"log_sig_q_{k}",
                -0.5 * jnp.log(self.lambda_posts[k]) + next(noise),
            )
            mean_function = loc_q
            if k != self.N:
                kappa_q = pyro.param(
                    f"kappa_q_{k}", self.target_kappas[k] + next(noise)
                )
                mean_function = kappa_q * previous_sample + loc_q
            previous_sample = pyro.sample(
                f"loc_latent_{k}",
                Normal(mean_function, jnp.exp(log_sig_q)),
                infer=dict(
                    baseline=dict(use_decaying_avg_baseline=True)
                ),
            )

    def param_error(self):
        err = 0.0
        for k in range(1, self.N + 1):
            err += float(
                jnp.sum((pyro.param(f"loc_q_{k}") - self.target_mus[k]) ** 2)
            )
            if k != self.N:
                err += float(
                    jnp.sum(
                        (pyro.param(f"kappa_q_{k}") - self.target_kappas[k])
                        ** 2
                    )
                )
        return err


@pytest.mark.parametrize(
    "N", [3, 5], ids=["N3", "N5"]
)
@pytest.mark.parametrize(
    "reparameterized", [True, False], ids=["reparam", "nonreparam"]
)
def test_chain_gradients_zero_at_optimum(N, reparameterized):
    """Port of ``tests/infer/test_conjugate_gradients.py``: with the
    variational parameters at the analytic optimum, the TraceGraph
    gradient estimate over 100k vectorized particles is ≈ 0 for every
    loc/log_sig/kappa parameter."""
    from pyro_tpu.infer.svi import ParamsMessenger

    pyro.clear_param_store()
    chain = Chain(N, difficulty=0.0)
    elbo = TraceGraph_ELBO(
        num_particles=100_000, vectorize_particles=True, max_plate_nesting=1
    )
    guide = lambda: chain.guide(reparameterized)
    # materialize params at the exact analytic targets
    elbo.loss(chain.model, guide, rng_key=jax.random.PRNGKey(1))
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p, k):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(chain.model, guide, rng_key=k)

    grads = jax.grad(loss_fn)(params, jax.random.PRNGKey(17))
    for i in range(1, N + 1):
        for prefix in ["loc_q_%d", "log_sig_q_%d", "kappa_q_%d"]:
            if i == N and prefix == "kappa_q_%d":
                continue
            g = np.asarray(grads[prefix % i])
            assert np.abs(g).max() < 0.10, (prefix % i, g)


@pytest.mark.parametrize(
    "N,reparameterized,n_steps,lr,prec,difficulty",
    [
        (3, True, 2000, 0.006, 0.03, 1.0),
        (5, True, 2000, 0.006, 0.04, 1.0),
        (3, False, 3500, 0.005, 0.05, 0.6),
    ],
    ids=["reparam-N3", "reparam-N5", "nonreparam-N3"],
)
def test_gaussian_chain_elbo(N, reparameterized, n_steps, lr, prec, difficulty):
    pyro.clear_param_store()
    chain = Chain(N, difficulty)
    guide = lambda: chain.guide(reparameterized)  # noqa: E731
    svi = SVI(
        chain.model,
        guide,
        Adam({"lr": lr, "betas": (0.95, 0.999)}),
        TraceGraph_ELBO(),
    )
    losses = svi.run_steps(n_steps, rng_key=jax.random.key(1))
    assert np.isfinite(np.asarray(losses)).all()
    err = chain.param_error()
    assert err < prec, f"param error {err} >= {prec}"
