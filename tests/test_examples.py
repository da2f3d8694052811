"""Example smoke tests.

Mirrors ``/root/reference/tests/test_examples.py:25-200``: every example
runs via subprocess with tiny step counts.  These double as end-to-end
integration coverage of the public API.

Run with ``pytest --stage test_examples`` (excluded from the unit tier).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.stage("test_examples")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES_DIR = os.path.join(REPO, "examples")

# (relative path, args) — step counts tuned so each runs in well under a
# minute of compute (compilation dominates)
CPU_EXAMPLES = [
    ("air.py", ["--num-epochs=1", "--num-data=64", "--batch-size=32"]),
    ("autoname_mixture.py", ["-n=10"]),
    ("autoname_scoping_mixture.py", ["-n=10"]),
    ("autoname_tree_data.py", ["-n=10"]),
    ("baseball.py", ["--num-samples=20", "--warmup-steps=20"]),
    ("capture_recapture/cjs.py", ["--num-steps=10"]),
    ("cevae_synthetic.py", ["--num-data=128", "--num-epochs=5"]),
    (
        "cvae.py",
        [
            "--num-epochs=1",
            "--num-data=128",
            "--batch-size=64",
            "--baseline-steps=10",
        ],
    ),
    ("dmm.py", ["--num-steps=5", "--batch-size=8"]),
    ("eight_schools.py", ["--num-samples=50", "--warmup-steps=50"]),
    ("eight_schools_svi.py", ["--num-epochs=50"]),
    (
        "epidemiology_sir.py",
        [
            "--duration=8",
            "--forecast=3",
            "--num-steps=50",
            "--num-samples=20",
            "--min-observations=2",
        ],
    ),
    ("einsum.py", []),
    (
        "epidemiology_regional.py",
        [
            "--duration=8",
            "--forecast=3",
            "--num-steps=50",
            "--num-samples=20",
            "--min-observations=2",
        ],
    ),
    ("forecast_bart.py", ["--num-steps=20", "--num-samples=5"]),
    ("gp_svdkl.py", ["--num-steps=20", "--num-data=64"]),
    ("hmm.py", ["--model=1", "--num-steps=3", "--hidden-dim=2"]),
    ("inclined_plane.py", ["-n=50"]),
    ("lda.py", ["--num-steps=10"]),
    ("lkj.py", ["--num-samples=30", "--warmup-steps=30"]),
    ("minipyro.py", ["-n=51"]),
    ("minipyro.py", ["-n=51", "--backend=pyro"]),
    (
        "mixed_hmm.py",
        ["--num-steps=5", "--timesteps=5", "--group=discrete"],
    ),
    ("mue_factor.py", ["--epochs=2"]),
    ("mue_profile_hmm.py", ["--epochs=2"]),
    ("neutra.py", ["--num-svi-steps=10", "--num-samples=20"]),
    ("oed_ab_test.py", ["--step=50", "--num-outer=20", "--num-inner=8"]),
    ("oed_gp_bayes_opt.py", ["--num-steps=2", "--num-candidates=8"]),
    ("rsa/generics.py", []),
    ("rsa/hyperbole.py", ["--price=10000"]),
    ("rsa/schelling.py", ["--depth=2"]),
    ("rsa/schelling_false.py", ["--depth=2"]),
    ("rsa/semantic_parsing.py", ["-n=5"]),
    ("scanvi.py", ["--num-epochs=1", "--num-data=200", "--batch-size=100"]),
    ("sir_hmc.py", ["--num-samples=20", "--warmup-steps=20", "--duration=6"]),
    ("smcfilter.py", ["--num-timesteps=5", "--num-particles=32"]),
    ("sparse_gamma_def.py", ["--num-steps=10"]),
    (
        "sparse_regression.py",
        [
            "--num-data=50",
            "--num-dimensions=10",
            "--active-dimensions=4",
            "--quadratic-dimensions=2",
            "--num-steps=50",
            "--num-restarts=2",
        ],
    ),
    ("ss_vae_M2.py", ["--num-epochs=1", "--num-data=200", "--batch-size=100"]),
    ("svi_data_parallel.py", ["--size=512", "--num-steps=50"]),
    ("svi_optax.py", ["--num-steps=100"]),
    ("timeseries_gp.py", ["--num-steps=20", "--train-window=20"]),
    (
        "toy_mixture_model_discrete_enumeration.py",
        ["--num-steps=10"],
    ),
    ("vae.py", ["--num-epochs=1", "--num-batches=2", "--batch-size=32"]),
    ("vae_comparison.py", ["--num-steps=30", "--batch-size=64"]),
]


def _example_id(example):
    path, args = example
    return path + " " + " ".join(args)


@pytest.mark.parametrize("example", CPU_EXAMPLES, ids=_example_id)
def test_cpu(example):
    path, args = example
    filename = os.path.join(EXAMPLES_DIR, path)
    if not os.path.exists(filename):
        pytest.skip(f"missing {path}")
    env = dict(os.environ)
    # drop external accelerator-plugin sites (e.g. an axon TPU tunnel)
    # from PYTHONPATH: examples must run hermetically on host CPU, and a
    # degraded tunnel can hang backend discovery even under
    # JAX_PLATFORMS=cpu
    inherited = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + inherited)
    # run examples on forced-CPU for hermetic CI (the axon plugin ignores
    # the env var, so examples check jax.config too — see conftest note)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    subprocess.check_call(
        [sys.executable, os.path.basename(filename)] + args,
        cwd=os.path.dirname(filename),
        env=env,
        timeout=600,
    )
