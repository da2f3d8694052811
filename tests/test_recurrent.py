"""Tests for pyro_tpu.nn.recurrent (lax.scan RNN/GRU/LSTM).

Parity axis: load torch ``nn.RNN``/``GRU``/``LSTM`` weights into the flax
module and assert the outputs match step for step — the weight layout and
gate order are documented as torch-compatible, so this is checkable
exactly (ref: the DMM guide's backward RNN, ``examples/dmm.py:173-181``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyro_tpu.nn.recurrent import RNN, GRUCell

B, T, I, H = 3, 7, 5, 4


def _torch_weights_to_flax(torch_mod, num_layers):
    params = {}
    for l in range(num_layers):
        params[f"w_ih_l{l}"] = jnp.asarray(
            getattr(torch_mod, f"weight_ih_l{l}").detach().numpy()
        )
        params[f"w_hh_l{l}"] = jnp.asarray(
            getattr(torch_mod, f"weight_hh_l{l}").detach().numpy()
        )
        params[f"b_ih_l{l}"] = jnp.asarray(
            getattr(torch_mod, f"bias_ih_l{l}").detach().numpy()
        )
        params[f"b_hh_l{l}"] = jnp.asarray(
            getattr(torch_mod, f"bias_hh_l{l}").detach().numpy()
        )
    return {"params": params}


@pytest.mark.parametrize("cell", ["relu", "tanh", "gru", "lstm"])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_matches_torch(cell, num_layers):
    torch = pytest.importorskip("torch")
    tnn = torch.nn
    torch.manual_seed(0)
    if cell in ("relu", "tanh"):
        tmod = tnn.RNN(I, H, num_layers=num_layers, nonlinearity=cell, batch_first=True)
    elif cell == "gru":
        tmod = tnn.GRU(I, H, num_layers=num_layers, batch_first=True)
    else:
        tmod = tnn.LSTM(I, H, num_layers=num_layers, batch_first=True)
    x_t = torch.randn(B, T, I)
    with torch.no_grad():
        out_t, fin_t = tmod(x_t)

    mod = RNN(features=H, cell=cell, num_layers=num_layers)
    variables = _torch_weights_to_flax(tmod, num_layers)
    out_j, fin_j = mod.apply(variables, jnp.asarray(x_t.numpy()))

    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-5, atol=1e-5)
    if cell == "lstm":
        np.testing.assert_allclose(fin_j[0], fin_t[0].numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(fin_j[1], fin_t[1].numpy(), rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(fin_j, fin_t.numpy(), rtol=1e-5, atol=1e-5)


def test_reverse_summarizes_future():
    # out[:, t] of a reversed RNN must depend on x[:, t:] only
    mod = RNN(features=H, cell="gru", reverse=True)
    x = jax.random.normal(jax.random.key(0), (B, T, I))
    variables = mod.init(jax.random.key(1), x)
    out, _ = mod.apply(variables, x)
    # perturbing the past must not change out[:, t]
    x2 = x.at[:, 0].add(10.0)
    out2, _ = mod.apply(variables, x2)
    np.testing.assert_allclose(out[:, 1:], out2[:, 1:], rtol=1e-6)
    assert not np.allclose(out[:, 0], out2[:, 0])
    # perturbing the future MUST change out[:, 0]
    x3 = x.at[:, -1].add(10.0)
    out3, _ = mod.apply(variables, x3)
    assert not np.allclose(out[:, 0], out3[:, 0])


def test_reverse_matches_torch_flip():
    # reversed RNN == torch RNN on the flipped sequence, flipped back
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    tmod = torch.nn.RNN(I, H, nonlinearity="relu", batch_first=True)
    x_t = torch.randn(B, T, I)
    with torch.no_grad():
        out_t, _ = tmod(torch.flip(x_t, [1]))
    expected = torch.flip(out_t, [1]).numpy()

    mod = RNN(features=H, cell="relu", reverse=True)
    variables = _torch_weights_to_flax(tmod, 1)
    out_j, _ = mod.apply(variables, jnp.asarray(x_t.numpy()))
    np.testing.assert_allclose(out_j, expected, rtol=1e-5, atol=1e-5)


def test_mask_carries_state_through_padding():
    mod = RNN(features=H, cell="gru")
    x = jax.random.normal(jax.random.key(0), (B, T, I))
    variables = mod.init(jax.random.key(1), x)
    lengths = jnp.array([T, 4, 2])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    out, fin = mod.apply(variables, x, mask=mask)
    # final state of row 1 == output at its last valid step
    np.testing.assert_allclose(fin[0, 1], out[1, 3], rtol=1e-6)
    np.testing.assert_allclose(fin[0, 2], out[2, 1], rtol=1e-6)
    # padded outputs just carry the state
    np.testing.assert_allclose(out[2, 2:], jnp.broadcast_to(out[2, 1], (T - 2, H)), rtol=1e-6)


@pytest.mark.parametrize("cell", ["relu", "gru", "lstm"])
def test_gradients_flow(cell):
    mod = RNN(features=H, cell=cell)
    x = jax.random.normal(jax.random.key(0), (B, T, I))
    variables = mod.init(jax.random.key(1), x)

    def loss(v, x):
        out, _ = mod.apply(v, x)
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves
    for leaf in leaves:
        assert jnp.all(jnp.isfinite(leaf))
        assert jnp.any(leaf != 0.0)
    # also differentiates w.r.t. the input
    gx = jax.grad(lambda xx: loss(variables, xx))(x)
    assert jnp.any(gx != 0.0)


def test_grad_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(2)
    tmod = torch.nn.GRU(I, H, batch_first=True)
    x_t = torch.randn(B, T, I, requires_grad=True)
    out_t, _ = tmod(x_t)
    out_t.pow(2).sum().backward()

    mod = RNN(features=H, cell="gru")
    variables = _torch_weights_to_flax(tmod, 1)
    x_j = jnp.asarray(x_t.detach().numpy())

    def loss(v, x):
        out, _ = mod.apply(v, x)
        return jnp.sum(out**2)

    g_params = jax.grad(loss)(variables, x_j)["params"]
    g_x = jax.grad(loss, argnums=1)(variables, x_j)
    np.testing.assert_allclose(g_x, x_t.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        g_params["w_hh_l0"], tmod.weight_hh_l0.grad.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        g_params["w_ih_l0"], tmod.weight_ih_l0.grad.numpy(), rtol=1e-4, atol=1e-4
    )


def test_gru_cell_single_step_matches_rnn():
    cell = GRUCell(features=H)
    x = jax.random.normal(jax.random.key(0), (B, I))
    h = jax.random.normal(jax.random.key(1), (B, H))
    variables = cell.init(jax.random.key(2), h, x)
    h1 = cell.apply(variables, h, x)

    rnn = RNN(features=H, cell="gru")
    rnn_vars = {
        "params": {
            "w_ih_l0": variables["params"]["w_ih"],
            "w_hh_l0": variables["params"]["w_hh"],
            "b_ih_l0": variables["params"]["b_ih"],
            "b_hh_l0": variables["params"]["b_hh"],
        }
    }
    out, _ = rnn.apply(rnn_vars, x[:, None, :], h0=h[None])
    np.testing.assert_allclose(h1, out[:, 0], rtol=1e-6)


def test_jit_and_scan_compatible():
    # the module must be usable inside a jitted SVI step: jit it and
    # check the second call hits the cache (no retrace errors)
    mod = RNN(features=H, cell="gru", reverse=True)
    x = jax.random.normal(jax.random.key(0), (B, T, I))
    variables = mod.init(jax.random.key(1), x)
    f = jax.jit(lambda v, x: mod.apply(v, x)[0])
    out1 = f(variables, x)
    out2 = f(variables, x + 1.0)
    assert out1.shape == out2.shape == (B, T, H)
