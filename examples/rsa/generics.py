"""Interpreting generic statements ("birds lay eggs") with RSA pragmatics.

Ref ``examples/rsa/generics.py`` (forestdb generics model; probLang
ch. 7): a pragmatic listener infers the prevalence of a property from a
generic utterance by reasoning about a speaker who chose the utterance
relative to an uncertain prevalence threshold.  All marginals are exact
via Search + HashingMarginal.

Run: ``python examples/rsa/generics.py``
"""

from __future__ import annotations

import argparse
import collections
import numbers

import jax.numpy as jnp
from search_inference import HashingMarginal, Search, memoize

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine


def Marginal(fn):
    return memoize(lambda *args: HashingMarginal(Search(fn).run(*args)))


Params = collections.namedtuple("Params", ["theta", "gamma", "delta"])


def discretize_beta_pdf(bins, gamma, delta):
    """Discretized Beta pdf for approximate integration via Search
    (ref :38-50)."""
    shape_alpha = gamma * delta
    shape_beta = (1.0 - gamma) * delta
    return jnp.array(
        [
            (x ** (shape_alpha - 1)) * ((1.0 - x) ** (shape_beta - 1))
            for x in bins
        ]
    )


@Marginal
def structured_prior_model(params):
    property_is_present = (
        float(
            pyro.sample("propertyIsPresent", dist.Bernoulli(params.theta))
        )
        == 1
    )
    if property_is_present:
        beta_bins = [0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99]
        ix = pyro.sample(
            "bin",
            dist.Categorical(
                probs=discretize_beta_pdf(
                    beta_bins, params.gamma, params.delta
                )
            ),
        )
        return beta_bins[int(ix)]
    return 0


def threshold_prior():
    threshold_bins = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    ix = pyro.sample(
        "threshold",
        dist.Categorical(logits=jnp.zeros(len(threshold_bins))),
    )
    return threshold_bins[int(ix)]


def utterance_prior():
    utterances = ["generic is true", "mu"]
    ix = pyro.sample(
        "utterance", dist.Categorical(logits=jnp.zeros(len(utterances)))
    )
    return utterances[int(ix)]


def meaning(utterance, state, threshold):
    if isinstance(utterance, numbers.Number):
        return state == utterance
    if utterance == "generic is true":
        return state > threshold
    if utterance == "generic is false":
        return state <= threshold
    if utterance == "mu":
        return True
    if utterance == "some":
        return state > 0
    if utterance == "most":
        return state >= 0.5
    if utterance == "all":
        return state >= 0.99
    return True


@Marginal
def listener0(utterance, threshold, prior):
    state = pyro.sample("state", prior)
    m = meaning(utterance, state, threshold)
    pyro.factor("listener0_true", 0.0 if m else -99999.0)
    return state


@Marginal
def speaker1(state, threshold, prior):
    s1_optimality = 5.0
    utterance = utterance_prior()
    L0 = listener0(utterance, threshold, prior)
    with poutine.scale(scale=s1_optimality):
        pyro.sample("L0_score", L0, obs=state)
    return utterance


@Marginal
def listener1(utterance, prior):
    state = pyro.sample("state", prior)
    threshold = threshold_prior()
    S1 = speaker1(state, threshold, prior)
    pyro.sample("S1_score", S1, obs=utterance)
    return state


@Marginal
def speaker2(prevalence, prior):
    utterance = utterance_prior()
    wL1 = listener1(utterance, prior)
    pyro.sample("wL1_score", wL1, obs=prevalence)
    return utterance


def main(args):
    hasWingsERP = structured_prior_model(
        Params(theta=0.5, gamma=0.99, delta=10.0)
    )
    laysEggsERP = structured_prior_model(
        Params(theta=0.5, gamma=0.5, delta=10.0)
    )
    carriesMalariaERP = structured_prior_model(
        Params(theta=0.1, gamma=0.01, delta=2.0)
    )
    areFemaleERP = structured_prior_model(
        Params(theta=0.99, gamma=0.5, delta=50.0)
    )

    listeners = {
        "wings": listener1("generic is true", hasWingsERP),
        "malaria": listener1("generic is true", carriesMalariaERP),
        "eggs": listener1("generic is true", laysEggsERP),
        "female": listener1("generic is true", areFemaleERP),
    }
    results = {}
    for name, listener in listeners.items():
        mean = 0.0
        for elt in listener.enumerate_support():
            p = float(jnp.exp(listener.log_prob(elt)))
            print(name, elt, p)
            mean += float(elt) * p
        results[name] = mean
        print(f"  -> E[prevalence | '{name} generic'] = {mean:.3f}")

    speakers = {
        "malaria": speaker2(0.1, carriesMalariaERP),
        "egg": speaker2(0.6, laysEggsERP),
        "female": speaker2(0.5, areFemaleERP),
        "lion": speaker2(0.01, laysEggsERP),
    }
    for name, speaker in speakers.items():
        for elt in speaker.enumerate_support():
            print(name, elt, float(jnp.exp(speaker.log_prob(elt))))
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="parse args")
    parser.add_argument("-n", "--num-samples", default=10, type=int)
    main(parser.parse_args())
