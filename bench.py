"""Headline benchmark: VAE amortized-SVI ELBO steps/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute numbers (BASELINE.md), so the baseline
is the reference pyro-ppl v1.9.1 itself (mounted at /root/reference),
executed on this host's CPU torch with the identical VAE architecture and
batch size.  ``vs_baseline`` = ours / reference (higher is better).  The
reference measurement is cached in .bench_baseline.json to keep repeat runs
fast; delete that file to re-measure.
"""

from __future__ import annotations

import json
import os
import sys
import time

BATCH = 256
X_DIM = 784
HIDDEN = 400
Z_DIM = 50
BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json"
)


def measure_reference_pyro() -> float:
    """VAE SVI steps/sec with the reference pyro on CPU torch.

    Runs in a subprocess so the reference's ``examples/`` namespace and
    torch state never leak into our process.
    """
    import subprocess

    code = (
        "import sys; sys.path.insert(0, '/root/reference');"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r});"
        "from bench import _reference_pyro_body; _reference_pyro_body()"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"reference benchmark failed: {out.stderr[-2000:]}")
    return float(out.stdout.strip().splitlines()[-1])


def _reference_pyro_body() -> None:
    import torch
    import torch.nn as tnn

    import pyro
    import pyro.distributions as pdist
    from pyro.infer import SVI, Trace_ELBO
    from pyro.optim import Adam

    torch.manual_seed(0)
    pyro.clear_param_store()

    class Decoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(Z_DIM, HIDDEN)
            self.fc2 = tnn.Linear(HIDDEN, X_DIM)

        def forward(self, z):
            return self.fc2(tnn.functional.softplus(self.fc1(z)))

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(X_DIM, HIDDEN)
            self.fc_loc = tnn.Linear(HIDDEN, Z_DIM)
            self.fc_scale = tnn.Linear(HIDDEN, Z_DIM)

        def forward(self, x):
            h = tnn.functional.softplus(self.fc1(x))
            return self.fc_loc(h), torch.exp(
                torch.clamp(self.fc_scale(h), -5, 5)
            )

    decoder, encoder = Decoder(), Encoder()

    def model(x):
        pyro.module("decoder", decoder)
        with pyro.plate("data", x.shape[0]):
            z = pyro.sample(
                "z",
                pdist.Normal(
                    torch.zeros(Z_DIM), torch.ones(Z_DIM)
                ).to_event(1),
            )
            logits = decoder(z)
            pyro.sample(
                "obs", pdist.Bernoulli(logits=logits).to_event(1), obs=x
            )

    def guide(x):
        pyro.module("encoder", encoder)
        with pyro.plate("data", x.shape[0]):
            loc, scale = encoder(x)
            pyro.sample("z", pdist.Normal(loc, scale).to_event(1))

    svi = SVI(model, guide, Adam({"lr": 1e-3}), Trace_ELBO())
    x = (torch.rand(BATCH, X_DIM) < 0.5).float()
    for _ in range(3):  # warmup
        svi.step(x)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        svi.step(x)
    print(n / (time.perf_counter() - t0))


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp

    import pyro_tpu as pyro
    from examples.vae import guide, model
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    pyro.clear_param_store()
    from pyro_tpu.nn import clear_module_registry

    clear_module_registry()
    pyro.set_rng_seed(0)
    x = (
        jax.random.uniform(jax.random.key(0), (BATCH, X_DIM)) < 0.5
    ).astype(jnp.float32)
    svi = SVI(model, guide, Adam({"lr": 1e-3}), Trace_ELBO())
    # compile + warmup (the scanned update is jit-cached across calls)
    n = 2000
    losses = svi.run_steps(n, x)
    assert float(losses[-1]) == float(losses[-1])  # finite sync
    # measure steady-state training throughput over repeated launches
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        losses = svi.run_steps(n, x)
    dt = time.perf_counter() - t0
    assert float(losses[-1]) == float(losses[-1])
    return reps * n / dt


def main() -> None:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)["vae_steps_per_sec"]
    else:
        baseline = measure_reference_pyro()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"vae_steps_per_sec": baseline}, f)

    ours = measure_ours()
    print(
        json.dumps(
            {
                "metric": "vae_elbo_steps_per_sec",
                "value": round(ours, 2),
                "unit": "steps/s",
                "vs_baseline": round(ours / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
