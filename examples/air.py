"""Attend-Infer-Repeat (AIR) on multi-object images.

Ref ``examples/air/{air,main,modules}.py`` condensed to one file:
a structured generative model that explains a scene with a variable
number of objects.  Per step t: a Bernoulli presence indicator z_pres_t
(cascade — once 0, stays 0), an attention window pose z_where_t
(scale, x, y), and window contents code z_what_t.  The decoded window is
pasted into the canvas by a spatial transformer.  The guide is a
recurrent (LSTM) inference network; the discrete z_pres choices use
data-dependent neural baselines (NVIL) through
``infer={"baseline": {"baseline_value": ...}}`` with TraceGraph_ELBO.

TPU-native notes: the spatial transformer (``F.affine_grid`` +
``F.grid_sample`` in the reference, ref ``air.py:382-397``) is an
explicit bilinear gather in jnp — a fixed-shape one-channel resample
that XLA fuses well; the (short, static) step loop unrolls into one
jitted SVI program.  Synthetic multi-blob canvases stand in for
multi-MNIST (no dataset egress).

Run:  python examples/air.py --num-steps 500
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, TraceGraph_ELBO
from pyro_tpu.nn import flax_module
from pyro_tpu.optim import Adam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

X_SIZE = 50
WINDOW = 28
Z_WHAT = 50
Z_WHERE = 3  # (scale, x, y)
RNN_HIDDEN = 256
NUM_STEPS = 3
Z_PRES_PRIOR_P = 0.5  # ref air.py:23-25
LIKELIHOOD_SD = 0.3

Z_WHERE_LOC_PRIOR = jnp.array([3.0, 0.0, 0.0])
Z_WHERE_SCALE_PRIOR = jnp.array([0.2, 1.0, 1.0])


# ---------------------------------------------------------------------
# Spatial transformer (ref air.py:347-397) as explicit bilinear gather.
# ---------------------------------------------------------------------


def expand_z_where(z_where):
    """[s, x, y] -> [[s, 0, x], [0, s, y]] (ref :352-364)."""
    s, x, y = z_where[..., 0], z_where[..., 1], z_where[..., 2]
    zero = jnp.zeros_like(s)
    row0 = jnp.stack([s, zero, x], -1)
    row1 = jnp.stack([zero, s, y], -1)
    return jnp.stack([row0, row1], -2)


def z_where_inv(z_where):
    """[s, x, y] -> [1/s, -x/s, -y/s] (ref :369-379)."""
    s = z_where[..., :1]
    return jnp.concatenate(
        [jnp.ones_like(s), -z_where[..., 1:]], -1
    ) / s


def grid_sample(images, theta, out_size):
    """Bilinear resample of (n, H, W) images through affine theta (n,2,3).

    Normalized coords in [-1, 1] (torch ``align_corners=False``
    convention); zero padding outside.
    """
    n, H, W = images.shape
    ys = (jnp.arange(out_size) + 0.5) * 2.0 / out_size - 1.0
    xs = (jnp.arange(out_size) + 0.5) * 2.0 / out_size - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], 0).reshape(3, -1)  # (3, S*S)
    src = theta @ coords  # (n, 2, S*S)
    sx = (src[:, 0] + 1.0) * W / 2.0 - 0.5
    sy = (src[:, 1] + 1.0) * H / 2.0 - 0.5
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    wx, wy = sx - x0, sy - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(
            images, yc, xc
        )
        return jnp.where(valid, vals, 0.0)

    out = (
        gather(y0, x0) * (1 - wy) * (1 - wx)
        + gather(y0, x0 + 1) * (1 - wy) * wx
        + gather(y0 + 1, x0) * wy * (1 - wx)
        + gather(y0 + 1, x0 + 1) * wy * wx
    )
    return out.reshape(n, out_size, out_size)


def window_to_image(z_where, windows):
    """Paste decoded windows into the canvas (ref :382-388)."""
    n = windows.shape[0]
    theta = expand_z_where(z_where)
    return grid_sample(
        windows.reshape(n, WINDOW, WINDOW), theta, X_SIZE
    )


def image_to_window(z_where, images):
    """Crop attention windows out of images (ref :391-397)."""
    n = images.shape[0]
    theta_inv = expand_z_where(z_where_inv(z_where))
    out = grid_sample(images, theta_inv, WINDOW)
    return out.reshape(n, -1)


# ---------------------------------------------------------------------
# Networks (ref modules.py)
# ---------------------------------------------------------------------


class Encoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(200)(x))
        loc = nn.Dense(Z_WHAT)(h)
        scale = jnp.exp(jnp.clip(nn.Dense(Z_WHAT)(h), -5.0, 5.0))
        return loc, scale


class Decoder(nn.Module):
    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(200)(z))
        # bias -2 so initial canvases are near-blank (ref main.py)
        return nn.sigmoid(nn.Dense(WINDOW * WINDOW)(h) - 2.0)


class Predict(nn.Module):
    @nn.compact
    def __call__(self, h):
        hh = nn.relu(nn.Dense(200)(h))
        z_pres_p = nn.sigmoid(nn.Dense(1)(hh))
        z_where_loc = nn.Dense(Z_WHERE)(hh)
        z_where_scale = nn.softplus(nn.Dense(Z_WHERE)(hh)) + 1e-3
        return z_pres_p, z_where_loc, z_where_scale


class LSTMStep(nn.Module):
    @nn.compact
    def __call__(self, carry, x):
        return nn.OptimizedLSTMCell(RNN_HIDDEN)(carry, x)


class BaselinePredict(nn.Module):
    @nn.compact
    def __call__(self, h):
        return nn.Dense(1)(nn.relu(nn.Dense(200)(h)))


def _nets(n):
    zeros_rnn_in = jnp.zeros(
        (1, X_SIZE * X_SIZE + Z_WHERE + Z_WHAT + 1)
    )
    carry0 = (
        jnp.zeros((1, RNN_HIDDEN)),
        jnp.zeros((1, RNN_HIDDEN)),
    )
    return dict(
        decode=flax_module(
            "air$$$decode", Decoder(), jnp.zeros((1, Z_WHAT))
        ),
        encode=flax_module(
            "air$$$encode", Encoder(), jnp.zeros((1, WINDOW * WINDOW))
        ),
        predict=flax_module(
            "air$$$predict", Predict(), jnp.zeros((1, RNN_HIDDEN))
        ),
        rnn=flax_module("air$$$rnn", LSTMStep(), carry0, zeros_rnn_in),
        bl_rnn=flax_module(
            "air$$$bl_rnn", LSTMStep(), carry0, zeros_rnn_in
        ),
        bl_predict=flax_module(
            "air$$$bl_predict",
            BaselinePredict(),
            jnp.zeros((1, RNN_HIDDEN)),
        ),
    )


def prior_step(t, n, prev, decode):
    """One generative step (ref :145-191)."""
    z_pres = pyro.sample(
        f"z_pres_{t}",
        dist.Bernoulli(Z_PRES_PRIOR_P * prev["z_pres"]).to_event(1),
    )
    sample_mask = z_pres
    z_where = pyro.sample(
        f"z_where_{t}",
        dist.Normal(Z_WHERE_LOC_PRIOR, Z_WHERE_SCALE_PRIOR)
        .expand((n, Z_WHERE))
        .mask(sample_mask)
        .to_event(1),
    )
    z_what = pyro.sample(
        f"z_what_{t}",
        dist.Normal(jnp.zeros(Z_WHAT), 1.0)
        .expand((n, Z_WHAT))
        .mask(sample_mask)
        .to_event(1),
    )
    y_att = decode(z_what)
    y = window_to_image(z_where, y_att)
    x = prev["x"] + y * z_pres[..., None]
    return dict(x=x, z_pres=z_pres, z_where=z_where)


def model(data):
    nets = _nets(data.shape[0])
    n = data.shape[0]
    with pyro.plate("data", n):
        state = dict(
            x=jnp.zeros((n, X_SIZE, X_SIZE)),
            z_pres=jnp.ones((n, 1)),
            z_where=None,
        )
        for t in range(NUM_STEPS):
            state = prior_step(t, n, state, nets["decode"])
        pyro.sample(
            "obs",
            dist.Normal(
                state["x"].reshape(n, -1), LIKELIHOOD_SD
            ).to_event(1),
            obs=data.reshape(n, -1),
        )
        return state


def guide_step(t, n, prev, inputs, nets):
    """One inference step (ref :262-344)."""
    rnn_input = jnp.concatenate(
        [inputs["embed"], prev["z_where"], prev["z_what"], prev["z_pres"]],
        -1,
    )
    (c, h), _ = nets["rnn"]((prev["c"], prev["h"]), rnn_input)
    z_pres_p, z_where_loc, z_where_scale = nets["predict"](h)

    # data-dependent NVIL baseline for the discrete choice (ref :313-344);
    # gradients must not flow from the baseline loss into the guide nets.
    bl_input = jnp.concatenate(
        [
            inputs["embed"],
            jax.lax.stop_gradient(prev["z_where"]),
            jax.lax.stop_gradient(prev["z_what"]),
            jax.lax.stop_gradient(prev["z_pres"]),
        ],
        -1,
    )
    (bl_c, bl_h), _ = nets["bl_rnn"]((prev["bl_c"], prev["bl_h"]), bl_input)
    bl_value = nets["bl_predict"](bl_h) * jax.lax.stop_gradient(
        prev["z_pres"]
    )
    infer_dict = dict(
        baseline=dict(baseline_value=bl_value.squeeze(-1))
    )

    z_pres = pyro.sample(
        f"z_pres_{t}",
        dist.Bernoulli(
            jnp.clip(z_pres_p, 1e-6, 1 - 1e-6) * prev["z_pres"]
        ).to_event(1),
        infer=infer_dict,
    )
    sample_mask = z_pres
    z_where = pyro.sample(
        f"z_where_{t}",
        dist.Normal(
            z_where_loc + Z_WHERE_LOC_PRIOR,
            z_where_scale * Z_WHERE_SCALE_PRIOR,
        )
        .mask(sample_mask)
        .to_event(1),
    )
    x_att = image_to_window(z_where, inputs["raw"])
    z_what_loc, z_what_scale = nets["encode"](x_att)
    z_what = pyro.sample(
        f"z_what_{t}",
        dist.Normal(z_what_loc, z_what_scale)
        .mask(sample_mask)
        .to_event(1),
    )
    return dict(
        h=h,
        c=c,
        bl_h=bl_h,
        bl_c=bl_c,
        z_pres=z_pres,
        z_where=z_where,
        z_what=z_what,
    )


def guide(data):
    nets = _nets(data.shape[0])
    n = data.shape[0]
    h_init = pyro.param("h_init", jnp.zeros((1, RNN_HIDDEN)))
    c_init = pyro.param("c_init", jnp.zeros((1, RNN_HIDDEN)))
    bl_h_init = pyro.param("bl_h_init", jnp.zeros((1, RNN_HIDDEN)))
    bl_c_init = pyro.param("bl_c_init", jnp.zeros((1, RNN_HIDDEN)))
    z_where_init = pyro.param("z_where_init", jnp.zeros((1, Z_WHERE)))
    z_what_init = pyro.param("z_what_init", jnp.zeros((1, Z_WHAT)))
    with pyro.plate("data", n):
        inputs = {
            "raw": data,
            "embed": data.reshape(n, -1),
        }
        state = dict(
            h=jnp.broadcast_to(h_init, (n, RNN_HIDDEN)),
            c=jnp.broadcast_to(c_init, (n, RNN_HIDDEN)),
            bl_h=jnp.broadcast_to(bl_h_init, (n, RNN_HIDDEN)),
            bl_c=jnp.broadcast_to(bl_c_init, (n, RNN_HIDDEN)),
            z_pres=jnp.ones((n, 1)),
            z_where=jnp.broadcast_to(z_where_init, (n, Z_WHERE)),
            z_what=jnp.broadcast_to(z_what_init, (n, Z_WHAT)),
        )
        z_wheres, z_press = [], []
        for t in range(NUM_STEPS):
            state = guide_step(t, n, state, inputs, nets)
            z_wheres.append(state["z_where"])
            z_press.append(state["z_pres"])
        return z_wheres, z_press


def synthetic_multi_object(key, n: int):
    """Canvases with 0-2 random blobs (multi-MNIST stand-in)."""
    kc, kp, kb = jax.random.split(key, 3)
    counts = jax.random.randint(kc, (n,), 0, 3)
    centers = jax.random.uniform(
        kp, (n, 2, 2), minval=10.0, maxval=40.0
    )
    yy, xx = jnp.meshgrid(
        jnp.arange(X_SIZE), jnp.arange(X_SIZE), indexing="ij"
    )
    blobs = jnp.exp(
        -(
            (yy[None, None] - centers[..., 0, None, None]) ** 2
            + (xx[None, None] - centers[..., 1, None, None]) ** 2
        )
        / (2 * 3.0**2)
    )
    present = (
        jnp.arange(2)[None, :] < counts[:, None]
    ).astype(jnp.float32)
    canvas = (blobs * present[..., None, None]).sum(1)
    return jnp.clip(canvas, 0.0, 1.0)


def count_accuracy(data, true_counts):
    """Infer object counts from the guide and compare."""
    _, z_press = guide(data)
    inferred = sum(zp.squeeze(-1) for zp in z_press)
    return float((inferred == true_counts).mean())


def main(args):
    pyro.set_rng_seed(args.seed)
    key = jax.random.key(args.seed)
    data = synthetic_multi_object(key, args.num_data)
    svi = SVI(
        model,
        guide,
        Adam({"lr": args.learning_rate}),
        TraceGraph_ELBO(),
    )
    bs = args.batch_size
    nb = max(1, args.num_data // bs)
    for epoch in range(args.num_epochs):
        total = 0.0
        for i in range(nb):
            total += float(svi.step(data[i * bs : (i + 1) * bs]))
        print(f"epoch {epoch}: loss {total / nb:.1f}")
    return total / nb


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-epochs", type=int, default=4)
    p.add_argument("--num-data", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
