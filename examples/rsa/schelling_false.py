"""Schelling coordination with false belief.

Ref ``examples/rsa/schelling_false.py``: Alice wants to AVOID Bob, so
she reasons about his recursive choice and picks the other location —
nested exact inference (Search + HashingMarginal) with an inverted
final decision.

Run: ``python examples/rsa/schelling_false.py --depth 2``
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
from search_inference import HashingMarginal, Search

import pyro_tpu as pyro
from pyro_tpu import poutine
from pyro_tpu.distributions import Bernoulli


def location(preference):
    """Flip a weighted coin between the two locations (ref :24-30)."""
    return pyro.sample("loc", Bernoulli(preference))


def alice_fb(preference, depth):
    """Alice reasons about Bob's choice, then goes elsewhere
    (ref :33-43)."""
    alice_prior = location(preference)
    with poutine.block():
        bob_marginal = HashingMarginal(
            Search(bob).run(preference, depth - 1)
        )
    pyro.sample("bob_choice", bob_marginal, obs=alice_prior)
    return 1 - alice_prior


def alice(preference, depth):
    alice_prior = location(preference)
    with poutine.block():
        bob_marginal = HashingMarginal(
            Search(bob).run(preference, depth - 1)
        )
    return pyro.sample("bob_choice", bob_marginal, obs=alice_prior)


def bob(preference, depth):
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
    alice_decision = HashingMarginal(
        Search(alice_fb).run(shared_preference, args.depth)
    )
    probs = {
        float(v): float(jnp.exp(alice_decision.log_prob(v)))
        for v in alice_decision.enumerate_support()
    }
    p_avoid_favored = probs.get(0.0, 0.0)
    print(
        "Probability Alice AVOIDS the favored location given preference "
        f"{args.preference} and depth {args.depth}: {p_avoid_favored:.3f}"
    )
    return p_avoid_favored


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="parse args")
    parser.add_argument("-n", "--num-samples", default=10, type=int)
    parser.add_argument("--depth", default=3, type=int)
    parser.add_argument("--preference", default=0.55, type=float)
    main(parser.parse_args())
