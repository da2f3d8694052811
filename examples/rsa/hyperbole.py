"""Interpreting hyperbole with RSA models of pragmatics
(ref ``examples/rsa/hyperbole.py``; probLang ch. 3).

A pragmatic listener hears "it cost $10,000" and infers, via nested
speaker/literal-listener reasoning over questions-under-discussion, that
the speaker is probably exaggerating to convey negative affect.

Run: ``python examples/rsa/hyperbole.py --price 10000``
"""

from __future__ import annotations

import argparse
import collections

import jax.numpy as jnp
import numpy as np
from search_inference import HashingMarginal, Search, memoize

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine


def Marginal(fn):
    return memoize(lambda *args: HashingMarginal(Search(fn).run(*args)))


State = collections.namedtuple("State", ["price", "valence"])


def approx(x, b=10.0):
    div = float(x) / b
    rounded = int(div) + 1 if div - float(int(div)) >= 0.5 else int(div)
    return int(b) * rounded


PRICES = [50, 51, 500, 501, 1000, 1001, 5000, 5001, 10000, 10001]
PRICE_PROBS = jnp.asarray(
    [0.4205, 0.3865, 0.0533, 0.0538, 0.0223, 0.0211, 0.0112, 0.0111, 0.0083, 0.0120]
)
VALENCE_PROBS = {
    50: 0.3173, 51: 0.3173, 500: 0.7920, 501: 0.7920, 1000: 0.8933,
    1001: 0.8933, 5000: 0.9524, 5001: 0.9524, 10000: 0.9864, 10001: 0.9864,
}


def price_prior():
    ix = pyro.sample("price", dist.Categorical(probs=PRICE_PROBS))
    return PRICES[int(ix)]


def valence_prior(price):
    return (
        float(
            pyro.sample(
                "valence", dist.Bernoulli(probs=VALENCE_PROBS[price])
            )
        )
        == 1.0
    )


def meaning(utterance, price):
    return utterance == price


qud_fns = {
    "price": lambda s: State(price=s.price, valence=None),
    "valence": lambda s: State(price=None, valence=s.valence),
    "priceValence": lambda s: State(price=s.price, valence=s.valence),
    "approxPrice": lambda s: State(price=approx(s.price), valence=None),
    "approxPriceValence": lambda s: State(
        price=approx(s.price), valence=s.valence
    ),
}
QUDS = list(qud_fns)


def qud_prior():
    ix = pyro.sample(
        "qud", dist.Categorical(probs=jnp.ones(len(QUDS)) / len(QUDS))
    )
    return QUDS[int(ix)]


def utterance_cost(u):
    return 0.0 if approx(u) == u else 1.0


def utterance_prior():
    logits = -jnp.asarray([utterance_cost(u) for u in PRICES])
    ix = pyro.sample("utterance", dist.Categorical(logits=logits))
    return PRICES[int(ix)]


@Marginal
def literal_listener(utterance, qud):
    price = price_prior()
    state = State(price=price, valence=valence_prior(price))
    pyro.factor(
        "literal_meaning",
        jnp.asarray(0.0 if meaning(utterance, price) else -999999.0),
    )
    return qud_fns[qud](state)


@Marginal
def speaker(qudValue, qud):
    utterance = utterance_prior()
    literal_marginal = literal_listener(utterance, qud)
    with poutine.scale(scale=1.0):
        pyro.sample("listener", literal_marginal, obs=qudValue)
    return utterance


@Marginal
def pragmatic_listener(utterance):
    price = price_prior()
    valence = valence_prior(price)
    qud = qud_prior()
    state = State(price=price, valence=valence)
    qudValue = qud_fns[qud](state)
    speaker_marginal = speaker(qudValue, qud)
    pyro.sample("speaker", speaker_marginal, obs=utterance)
    return state


def main(args):
    listener = pragmatic_listener(args.price)
    support = listener.enumerate_support()
    probs = np.asarray(listener.probs)
    order = np.argsort(-probs)
    print(f'Pragmatic listener hears "it cost ${args.price}":')
    for i in order[:6]:
        s = support[i]
        print(f"  P(price={s.price}, valence={s.valence}) = {probs[i]:.4f}")
    p_hyperbole = sum(
        float(p)
        for s, p in zip(support, probs)
        if s.price != args.price
    )
    p_negative = sum(
        float(p) for s, p in zip(support, probs) if s.valence
    )
    print(f"P(actual price != uttered price) = {p_hyperbole:.3f}")
    print(f"P(negative affect) = {p_negative:.3f}")
    return support, probs


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="RSA hyperbole")
    parser.add_argument("--price", default=10000, type=int)
    main(parser.parse_args())
