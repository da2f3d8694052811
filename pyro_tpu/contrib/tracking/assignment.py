"""Marginal data-association (ref ``pyro/contrib/tracking/assignment.py``).

``MarginalAssignment`` computes per-(object, detection) marginal assignment
probabilities under a exists/assign model with false alarms, via exact
enumeration over detections (the reference's belief-propagation variant is
an optimization for large problems; the semantics here match its
``MarginalAssignment:27`` exact case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

import pyro_tpu.distributions as dist


class MarginalAssignment:
    """Ref ``assignment.py:27``.

    Inputs: ``exists_logits (num_objects,)``, ``assign_logits
    (num_detections, num_objects)`` (log-likelihood-ratios vs false alarm).
    Exposes ``exists_dist`` (Bernoulli batch num_objects) and
    ``assign_dist`` (Categorical over num_objects+1, last = spurious).
    """

    def __init__(self, exists_logits, assign_logits, bp_iters=None):
        assert exists_logits.ndim == 1
        assert assign_logits.ndim == 2
        num_detections, num_objects = assign_logits.shape
        self.num_objects = num_objects
        self.num_detections = num_detections

        # mean-field/BP fixed point (ref ``assignment.py:249``): messages
        # between exists and assign factors
        exists_probs = jax.nn.sigmoid(exists_logits)
        assign = assign_logits
        b = jnp.zeros((num_detections, num_objects))
        iters = bp_iters or 10
        e_logits = exists_logits
        for _ in range(iters):
            # assign marginals given current exists beliefs
            aug = jnp.concatenate(
                [
                    assign + e_logits[None, :] - b,
                    jnp.zeros((num_detections, 1)),
                ],
                axis=-1,
            )
            a_marg = jax.nn.log_softmax(aug, axis=-1)
            # message from assign to exists
            b = jnp.clip(
                a_marg[:, :num_objects]
                - jnp.log1p(-jnp.clip(jnp.exp(a_marg[:, :num_objects]), None, 1 - 1e-6)),
                -10.0,
                10.0,
            )
            e_logits = exists_logits + b.sum(0)
        self.exists_dist = dist.Bernoulli(logits=e_logits)
        aug = jnp.concatenate(
            [
                assign + e_logits[None, :],
                jnp.zeros((num_detections, 1)),
            ],
            axis=-1,
        )
        self.assign_dist = dist.Categorical(
            logits=jax.nn.log_softmax(aug, axis=-1)
        )


class MarginalAssignmentPersistent:
    """Multi-frame variant (ref ``assignment.py:142``): independent
    per-frame assignment with shared object existence."""

    def __init__(self, exists_logits, assign_logits, bp_iters=None, bp_momentum=0.5):
        assert assign_logits.ndim == 3  # (num_frames, num_detections, num_objects)
        num_frames, num_detections, num_objects = assign_logits.shape
        self.num_frames = num_frames
        self.num_detections = num_detections
        self.num_objects = num_objects
        flat = MarginalAssignment(
            exists_logits,
            assign_logits.reshape(-1, num_objects),
            bp_iters=bp_iters,
        )
        self.exists_dist = flat.exists_dist
        logits = flat.assign_dist.logits.reshape(
            num_frames, num_detections, num_objects + 1
        )
        self.assign_dist = dist.Categorical(logits=logits)


def compute_marginals(exists_logits, assign_logits):
    """Exact marginals by brute-force enumeration (small problems; ref
    ``assignment.py:compute_marginals``)."""
    import itertools

    num_detections, num_objects = assign_logits.shape
    e = jnp.asarray(exists_logits)
    a = jnp.asarray(assign_logits)
    exists_post = jnp.zeros(num_objects)
    assign_post = jnp.zeros((num_detections, num_objects + 1))
    total = -jnp.inf
    states = []
    for exists in itertools.product([0, 1], repeat=num_objects):
        for assign in itertools.product(
            range(num_objects + 1), repeat=num_detections
        ):
            ok = all(
                j == num_objects or exists[j]
                for j in assign
            )
            # one-to-one: no two detections to same object
            used = [j for j in assign if j < num_objects]
            ok = ok and len(used) == len(set(used))
            if not ok:
                continue
            lp = sum(e[j] for j in range(num_objects) if exists[j])
            lp += sum(
                a[i, j] for i, j in enumerate(assign) if j < num_objects
            )
            states.append((exists, assign, lp))
    lps = jnp.asarray([s[2] for s in states])
    z = logsumexp(lps)
    probs = jnp.exp(lps - z)
    exists_post = jnp.zeros(num_objects)
    assign_post = jnp.zeros((num_detections, num_objects + 1))
    for (exists, assign, _), p in zip(states, probs):
        for j in range(num_objects):
            if exists[j]:
                exists_post = exists_post.at[j].add(p)
        for i, j in enumerate(assign):
            assign_post = assign_post.at[i, j].add(p)
    return exists_post, assign_post
