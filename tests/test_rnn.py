"""rnn_scan vs torch cuDNN-semantics RNNs (pack_padded parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepspeech_tpu.ops.rnn import rnn_scan

torch = pytest.importorskip("torch")


def _torch_rnn_ref(cell, x, lengths, bidirectional, seed=0):
    """Reference path: BN-free BatchRNN forward (reference model.py:97-109)."""
    t, b, f = x.shape
    h = 16
    torch.manual_seed(seed)
    cls = {"gru": torch.nn.GRU, "lstm": torch.nn.LSTM, "rnn": torch.nn.RNN}[cell]
    rnn = cls(input_size=f, hidden_size=h, bidirectional=bidirectional,
              bias=True)
    xt = torch.from_numpy(x)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt, torch.tensor(lengths), enforce_sorted=False)
    out, _ = rnn(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, total_length=t)
    if bidirectional:
        out = out.view(t, b, 2, -1).sum(2)
    return rnn, out.detach().numpy(), h


def _port_weights(rnn, cell, bidirectional):
    d = 2 if bidirectional else 1
    w_ih, b_ih, w_hh, b_hh = [], [], [], []
    for direction in range(d):
        sfx = "_reverse" if direction else ""
        w_ih.append(getattr(rnn, f"weight_ih_l0{sfx}").detach().numpy().T)
        w_hh.append(getattr(rnn, f"weight_hh_l0{sfx}").detach().numpy().T)
        b_ih.append(getattr(rnn, f"bias_ih_l0{sfx}").detach().numpy())
        b_hh.append(getattr(rnn, f"bias_hh_l0{sfx}").detach().numpy())
    return (jnp.asarray(np.stack(w_ih)), jnp.asarray(np.stack(b_ih)),
            jnp.asarray(np.stack(w_hh)), jnp.asarray(np.stack(b_hh)))


@pytest.mark.parametrize("cell", ["gru", "lstm", "rnn"])
@pytest.mark.parametrize("bidirectional", [True, False])
def test_rnn_scan_matches_torch(cell, bidirectional):
    rng = np.random.default_rng(0)
    t, b, f = 12, 3, 8
    lengths = [12, 9, 5]
    x = rng.standard_normal((t, b, f)).astype(np.float32)
    # zero padded region like the surrounding model does
    for i, L in enumerate(lengths):
        x[L:, i] = 0
    rnn, ref, h = _torch_rnn_ref(cell, x, lengths, bidirectional)
    w_ih, b_ih, w_hh, b_hh = _port_weights(rnn, cell, bidirectional)
    out = np.asarray(rnn_scan(jnp.asarray(x), jnp.asarray(lengths),
                              w_ih, b_ih, w_hh, b_hh, cell=cell,
                              bidirectional=bidirectional))
    assert out.shape == ref.shape == (t, b, h)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # padded region must be exactly zero (pad_packed semantics)
    for i, L in enumerate(lengths):
        assert np.all(out[L:, i] == 0)
