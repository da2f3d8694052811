"""Amortized Latent Dirichlet Allocation (ref ``examples/lda.py``).

The per-word topic assignments are enumerated out exactly by
``TraceEnum_ELBO`` (tensor variable elimination on the MXU); document
topics use an amortized MLP guide over word histograms.  The full SVI
step — enumeration einsums included — compiles to one XLA program.

Run: ``python examples/lda.py -n 200``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, TraceEnum_ELBO
from pyro_tpu.optim import ClippedAdam


def model(data=None, args=None, batch_size=None):
    # Globals.
    with pyro.plate("topics", args.num_topics):
        topic_weights = pyro.sample(
            "topic_weights", dist.Gamma(1.0 / args.num_topics, 1.0)
        )
        topic_words = pyro.sample(
            "topic_words",
            dist.Dirichlet(jnp.ones(args.num_words) / args.num_words),
        )

    # Locals.
    with pyro.plate("documents", args.num_docs, batch_size) as ind:
        if data is not None:
            data = data[:, ind]
        doc_topics = pyro.sample(
            "doc_topics", dist.Dirichlet(topic_weights)
        )
        with pyro.plate("words", args.num_words_per_doc):
            # marginalized out exactly by TraceEnum_ELBO
            word_topics = pyro.sample(
                "word_topics",
                dist.Categorical(probs=doc_topics),
                infer={"enumerate": "parallel"},
            )
            data = pyro.sample(
                "doc_words",
                dist.Categorical(probs=topic_words[word_topics]),
                obs=data,
            )
    return topic_weights, topic_words, data


def _mlp_params(args):
    sizes = (
        [args.num_words]
        + [int(s) for s in args.layer_sizes.split("-")]
        + [args.num_topics]
    )
    rs = np.random.RandomState(0)
    params = []
    for i, (n_in, n_out) in enumerate(zip(sizes, sizes[1:])):
        W = pyro.param(
            f"predictor_W_{i}",
            jnp.asarray(rs.normal(0, 0.001, (n_in, n_out)), jnp.float32),
        )
        b = pyro.param(f"predictor_b_{i}", jnp.zeros(n_out))
        params.append((W, b))
    return params


def _predictor(params, counts):
    h = counts
    for i, (W, b) in enumerate(params):
        h = h @ W + b
        if i + 1 < len(params):
            h = jax.nn.sigmoid(h)
    return jax.nn.softmax(h, axis=-1)


def parametrized_guide(data, args, batch_size=None):
    # conjugate guide for globals
    topic_weights_posterior = pyro.param(
        "topic_weights_posterior",
        jnp.ones(args.num_topics),
        constraint=constraints.positive,
    )
    topic_words_posterior = pyro.param(
        "topic_words_posterior",
        jnp.ones((args.num_topics, args.num_words)),
        constraint=constraints.greater_than(0.5),
    )
    with pyro.plate("topics", args.num_topics):
        pyro.sample(
            "topic_weights", dist.Gamma(topic_weights_posterior, 1.0)
        )
        pyro.sample("topic_words", dist.Dirichlet(topic_words_posterior))

    # amortized guide for locals; histogram via one-hot sum (TPU-friendly
    # replacement for the reference's scatter_add)
    params = _mlp_params(args)
    with pyro.plate("documents", args.num_docs, batch_size) as ind:
        batch = data[:, ind]
        counts = jnp.sum(
            jax.nn.one_hot(batch, args.num_words, dtype=jnp.float32), axis=0
        )
        doc_topics = _predictor(params, counts)
        pyro.sample("doc_topics", dist.Delta(doc_topics, event_dim=1))


def main(args):
    pyro.set_rng_seed(0)
    pyro.clear_param_store()

    # generate synthetic data from the model itself
    from pyro_tpu import poutine

    with poutine.seed(rng_key=jax.random.key(0)):
        true_topic_weights, true_topic_words, data = model(args=args)

    # close over the static config so the jitted step sees only arrays
    import functools

    model_fn = functools.partial(
        model, args=args, batch_size=args.batch_size
    )
    guide_fn = functools.partial(
        parametrized_guide, args=args, batch_size=args.batch_size
    )
    elbo = TraceEnum_ELBO(max_plate_nesting=2)
    optim = ClippedAdam({"lr": args.learning_rate})
    svi = SVI(
        lambda data: model_fn(data), lambda data: guide_fn(data), optim, elbo
    )
    losses = []
    for step in range(args.num_steps):
        loss = svi.step(data)
        losses.append(loss)
        if step % 50 == 0:
            print(f"{step: >5d}\t{loss:.1f}")
    print(f"final loss = {losses[-1]:.1f}")
    return losses


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Amortized Latent Dirichlet Allocation"
    )
    parser.add_argument("-t", "--num-topics", default=8, type=int)
    parser.add_argument("-w", "--num-words", default=1024, type=int)
    parser.add_argument("-d", "--num-docs", default=1000, type=int)
    parser.add_argument("-wd", "--num-words-per-doc", default=64, type=int)
    parser.add_argument("-n", "--num-steps", default=1000, type=int)
    parser.add_argument("-l", "--layer-sizes", default="100-100")
    parser.add_argument("-lr", "--learning-rate", default=0.01, type=float)
    parser.add_argument("-b", "--batch-size", default=32, type=int)
    main(parser.parse_args())
