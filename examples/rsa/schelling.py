"""Schelling coordination game (ref ``examples/rsa/schelling.py``).

Two spies, Alice and Bob, want to meet.  They choose between two
locations without communicating by recursively reasoning about one
another: each agent's choice conditions on a marginal over the OTHER
agent's recursive decision (exact enumeration via Search +
HashingMarginal).

Run: ``python examples/rsa/schelling.py --depth 2``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from search_inference import HashingMarginal, Search

import pyro_tpu as pyro
from pyro_tpu import poutine
from pyro_tpu.distributions import Bernoulli


def location(preference):
    """Flip a weighted coin to decide between two meeting locations."""
    return pyro.sample("loc", Bernoulli(preference))


def alice(preference, depth):
    """Alice reasons about Bob's choice."""
    alice_prior = location(preference)
    with poutine.block():
        bob_marginal = HashingMarginal(
            Search(bob).run(preference, depth - 1)
        )
    return pyro.sample("bob_choice", bob_marginal, obs=alice_prior)


def bob(preference, depth):
    """Bob reasons about Alice's choice."""
    bob_prior = location(preference)
    if depth > 0:
        with poutine.block():
            alice_marginal = HashingMarginal(
                Search(alice).run(preference, depth)
            )
        return pyro.sample("alice_choice", alice_marginal, obs=bob_prior)
    return bob_prior


def main(args):
    shared_preference = jnp.asarray(args.preference)

    bob_decision = HashingMarginal(
        Search(bob).run(shared_preference, args.depth)
    )
    probs = np.asarray(bob_decision.probs)
    support = [float(v) for v in bob_decision.enumerate_support()]
    print(f"support = {support}, probs = {probs.round(4)}")

    freq = np.mean(
        [
            float(bob_decision.sample(jax.random.key(i)))
            for i in range(args.num_samples)
        ]
    )
    print(
        f"Empirical frequency of Bob choosing the favored location given "
        f"preference {args.preference} and depth {args.depth}: {freq:.3f}"
    )
    return probs, support


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Schelling coordination")
    parser.add_argument("-n", "--num-samples", default=100, type=int)
    parser.add_argument("--depth", default=2, type=int)
    parser.add_argument("--preference", default=0.55, type=float)
    main(parser.parse_args())
