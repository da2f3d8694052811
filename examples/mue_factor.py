"""FactorMuE: probabilistic PCA with a MuE observation model.

Ref ``examples/contrib/mue/FactorMuE.py`` (Weinstein & Marks 2021):
a continuous latent embedding per sequence decoded through a MuE
alignment model — visualizes sequence families in latent space without
a multiple sequence alignment.

Run:  python examples/mue_factor.py --epochs 10
"""

from __future__ import annotations

import argparse

import numpy as np

import pyro_tpu as pyro
from pyro_tpu.contrib.mue.dataloaders import BiosequenceDataset
from pyro_tpu.contrib.mue.models import FactorMuE

SEQUENCES = [
    "CATTG",
    "CATG",
    "ACATTG",
    "CATTGG",
    "GGTAC",
    "GGTAAC",
    "GTAC",
    "GGTACA",
]


def main(args):
    pyro.set_rng_seed(args.seed)
    pyro.clear_param_store()
    dataset = BiosequenceDataset(SEQUENCES, "list", "dna")
    model = FactorMuE(
        dataset.max_length,
        dataset.alphabet_length,
        z_dim=args.z_dim,
        batch_size=args.batch_size,
        latent_seq_length=args.latent_seq_length,
        substitution_matrix=False,
    )
    losses = model.fit_svi(
        dataset,
        epochs=args.epochs,
        anneal_length=args.anneal,
        learning_rate=args.learning_rate,
    )
    print(
        f"loss: first={float(losses[0]):.2f} last={float(losses[-1]):.2f}"
    )
    z_loc, z_scale = model.embed(dataset)
    z = np.asarray(z_loc)
    print("latent embeddings (z_loc):")
    for seq, zi in zip(SEQUENCES, z):
        print(f"  {seq:8s} -> {np.array2string(zi, precision=2)}")
    # the two families (CAT* vs GGT*) should separate in latent space
    d_within = np.linalg.norm(z[0] - z[1])
    d_across = np.linalg.norm(z[0] - z[4])
    print(f"within-family dist {d_within:.3f}, across {d_across:.3f}")
    return float(d_across - d_within)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="FactorMuE")
    p.add_argument("--z-dim", type=int, default=2)
    p.add_argument("--latent-seq-length", type=int, default=5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--anneal", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
