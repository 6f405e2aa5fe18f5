"""DeepSpeech2 model tests: shape/length contracts + full forward parity
against a torch replica of the reference architecture (model.py:183-380)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.models import DeepSpeech2, conv_out_lengths

torch = pytest.importorskip("torch")


def _build_torch_replica(hidden, layers, num_classes, seed=0):
    """Reference DS2 (bidirectional GRU) re-stated in torch for the oracle."""
    torch.manual_seed(seed)
    conv1 = torch.nn.Conv2d(1, 32, (41, 11), (2, 2), (20, 5))
    bn1 = torch.nn.BatchNorm2d(32)
    conv2 = torch.nn.Conv2d(32, 32, (21, 11), (2, 1), (10, 5))
    bn2 = torch.nn.BatchNorm2d(32)
    rnns, bns = [], []
    rnn_input = 32 * 41
    for i in range(layers):
        rnns.append(torch.nn.GRU(rnn_input if i == 0 else hidden, hidden,
                                 bidirectional=True, bias=True))
        bns.append(torch.nn.BatchNorm1d(rnn_input if i == 0 else hidden)
                   if i > 0 else None)
    fc_bn = torch.nn.BatchNorm1d(hidden)
    fc = torch.nn.Linear(hidden, num_classes, bias=False)
    return conv1, bn1, conv2, bn2, rnns, bns, fc_bn, fc


def _torch_forward(mods, x, lengths):
    """Reference forward math (model.py:343-380), eval-mode BN."""
    conv1, bn1, conv2, bn2, rnns, bns, fc_bn, fc = mods
    out_lengths = [(l - 1) // 2 + 1 for l in lengths]

    def mask_time(h):
        for i, L in enumerate(out_lengths):
            h[i, :, :, L:] = 0
        return h

    with torch.no_grad():
        h = x[:, None]  # (B,1,161,T)
        h = mask_time(conv1(h))
        h = mask_time(bn1.eval()(h))
        h = mask_time(torch.clamp(h, 0, 20))
        h = mask_time(conv2(h))
        h = mask_time(bn2.eval()(h))
        h = mask_time(torch.clamp(h, 0, 20))
        b, c, f, t = h.shape
        h = h.view(b, c * f, t).permute(2, 0, 1).contiguous()  # (T,B,1312)
        for i, rnn in enumerate(rnns):
            if bns[i] is not None:
                tt, bb = h.shape[0], h.shape[1]
                h = bns[i].eval()(h.view(tt * bb, -1)).view(tt, bb, -1)
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                h, torch.tensor(out_lengths), enforce_sorted=False)
            out, _ = rnn(packed)
            h, _ = torch.nn.utils.rnn.pad_packed_sequence(out, total_length=t)
            h = h.view(t, b, 2, -1).sum(2)
        tt, bb = h.shape[0], h.shape[1]
        h = fc_bn.eval()(h.view(tt * bb, -1)).view(tt, bb, -1)
        h = fc(h)
        logits = h.transpose(0, 1)
        return logits.numpy(), np.array(out_lengths)


def _port_to_flax(mods, variables):
    """Write torch replica weights into the flax variable tree."""
    conv1, bn1, conv2, bn2, rnns, bns, fc_bn, fc = mods
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def conv_kernel(m):  # torch (out,in,kh,kw) -> flax (kh,kw,in,out)
        return m.weight.detach().numpy().transpose(2, 3, 1, 0)

    p = params["conv"]
    p["conv0"]["kernel"], p["conv0"]["bias"] = conv_kernel(conv1), conv1.bias.detach().numpy()
    p["conv1"]["kernel"], p["conv1"]["bias"] = conv_kernel(conv2), conv2.bias.detach().numpy()
    for j, bn in [(0, bn1), (1, bn2)]:
        params["conv"][f"bn{j}"]["scale"] = bn.weight.detach().numpy()
        params["conv"][f"bn{j}"]["bias"] = bn.bias.detach().numpy()
        stats["conv"][f"bn{j}"]["mean"] = bn.running_mean.numpy()
        stats["conv"][f"bn{j}"]["var"] = bn.running_var.numpy()
    for i, rnn in enumerate(rnns):
        r = params[f"rnn{i}"]
        r["w_ih"] = np.stack([rnn.weight_ih_l0.detach().numpy().T,
                              rnn.weight_ih_l0_reverse.detach().numpy().T])
        r["w_hh"] = np.stack([rnn.weight_hh_l0.detach().numpy().T,
                              rnn.weight_hh_l0_reverse.detach().numpy().T])
        r["b_ih"] = np.stack([rnn.bias_ih_l0.detach().numpy(),
                              rnn.bias_ih_l0_reverse.detach().numpy()])
        r["b_hh"] = np.stack([rnn.bias_hh_l0.detach().numpy(),
                              rnn.bias_hh_l0_reverse.detach().numpy()])
        if bns[i] is not None:
            r["bn"]["scale"] = bns[i].weight.detach().numpy()
            r["bn"]["bias"] = bns[i].bias.detach().numpy()
            stats[f"rnn{i}"]["bn"]["mean"] = bns[i].running_mean.numpy()
            stats[f"rnn{i}"]["bn"]["var"] = bns[i].running_var.numpy()
    params["fc_bn"]["scale"] = fc_bn.weight.detach().numpy()
    params["fc_bn"]["bias"] = fc_bn.bias.detach().numpy()
    stats["fc_bn"]["mean"] = fc_bn.running_mean.numpy()
    stats["fc_bn"]["var"] = fc_bn.running_var.numpy()
    params["fc"]["kernel"] = fc.weight.detach().numpy().T
    return {"params": params, "batch_stats": stats}


def test_forward_parity_with_torch_replica():
    hidden, layers, classes = 24, 2, 10
    b, t = 2, 33
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, 161, t)).astype(np.float32) * 0.5
    lengths = [33, 21]
    for i, L in enumerate(lengths):
        x[i, :, L:] = 0

    mods = _build_torch_replica(hidden, layers, classes)
    # randomize running stats so eval-mode BN is a real test
    for m in [mods[1], mods[3], mods[6]] + [m for m in mods[5] if m is not None]:
        m.running_mean.uniform_(-0.2, 0.2)
        m.running_var.uniform_(0.6, 1.4)
    ref_logits, ref_lengths = _torch_forward(
        mods, torch.from_numpy(x), lengths)

    model = DeepSpeech2(num_classes=classes, hidden_size=hidden,
                        hidden_layers=layers, cell="gru", bidirectional=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(lengths), False)
    variables = _port_to_flax(mods, variables)
    logits, probs, out_lengths = model.apply(
        variables, jnp.asarray(x), jnp.asarray(lengths), False)

    assert np.array_equal(np.asarray(out_lengths), ref_lengths)
    for i, L in enumerate(ref_lengths):
        np.testing.assert_allclose(np.asarray(logits)[i, :L],
                                   ref_logits[i, :L], rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(jax.nn.softmax(logits, -1)), atol=1e-6)


def test_conv_out_lengths():
    lens = jnp.asarray([1, 2, 3, 100, 751])
    np.testing.assert_array_equal(np.asarray(conv_out_lengths(lens)),
                                  [1, 1, 2, 50, 376])


def test_train_mode_updates_batch_stats():
    model = DeepSpeech2(num_classes=5, hidden_size=8, hidden_layers=2)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 161, 19)).astype(np.float32))
    lengths = jnp.asarray([19, 11])
    variables = model.init(jax.random.PRNGKey(0), x, lengths, False)
    _, updated = model.apply(variables, x, lengths, True,
                             mutable=["batch_stats"])
    before = variables["batch_stats"]["conv"]["bn0"]["mean"]
    after = updated["batch_stats"]["conv"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_unidirectional_with_lookahead():
    model = DeepSpeech2(num_classes=5, hidden_size=8, hidden_layers=1,
                        bidirectional=False)
    x = jnp.zeros((1, 161, 19))
    lengths = jnp.asarray([19])
    variables = model.init(jax.random.PRNGKey(0), x, lengths, False)
    assert "lookahead" in variables["params"]
    logits, _, out_lengths = model.apply(variables, x, lengths, False)
    assert logits.shape == (1, 10, 5)
    assert int(out_lengths[0]) == 10
