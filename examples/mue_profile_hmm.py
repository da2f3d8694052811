"""Profile HMM over biological sequences (MuE observation model).

Ref ``examples/contrib/mue/ProfileHMM.py`` (Weinstein & Marks 2021):
fit a Bayesian profile HMM with a MuE missingness/indel observation
model to a family of sequences, report heldout perplexity.

Run:  python examples/mue_profile_hmm.py --epochs 10
"""

from __future__ import annotations

import argparse

import numpy as np

import pyro_tpu as pyro
from pyro_tpu.contrib.mue.dataloaders import BiosequenceDataset
from pyro_tpu.contrib.mue.models import ProfileHMM

SEQUENCES = [
    "CATTG",
    "CATG",
    "ACATTG",
    "CATTGG",
    "CTTG",
    "CATTA",
]


def main(args):
    pyro.set_rng_seed(args.seed)
    pyro.clear_param_store()
    dataset = BiosequenceDataset(SEQUENCES, "list", "dna")
    n_train = max(2, int(0.8 * len(SEQUENCES)))
    train = BiosequenceDataset(SEQUENCES[:n_train], "list", "dna")
    test = BiosequenceDataset(SEQUENCES[n_train:], "list", "dna")

    model = ProfileHMM(
        latent_seq_length=args.latent_seq_length
        or int(dataset.max_length),
        alphabet_length=dataset.alphabet_length,
        prior_scale=args.prior_scale,
        indel_prior_bias=args.indel_prior_bias,
    )
    losses = model.fit_svi(
        train,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
    )
    print(
        f"loss: first={float(losses[0]):.2f} last={float(losses[-1]):.2f}"
    )
    lp_train, _, perplex_train, _ = model.evaluate(train)
    lp_test, _, perplex_test, _ = model.evaluate(test)
    print(
        "train: logp=%.2f perplexity=%.3f | test: logp=%.2f "
        "perplexity=%.3f"
        % (lp_train, perplex_train, lp_test, perplex_test)
    )
    assert np.isfinite(lp_test)
    return float(perplex_test)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Profile HMM (MuE)")
    p.add_argument("--latent-seq-length", type=int, default=None)
    p.add_argument("--prior-scale", type=float, default=1.0)
    p.add_argument("--indel-prior-bias", type=float, default=10.0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
