"""Torch-checkpoint importer: reference-format package -> native checkpoint,
with full forward parity through the real inference loading path."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.test_model import (_build_torch_replica, _torch_forward)  # noqa: E402

from deepspeech_tpu.cli.import_torch import convert_package  # noqa: E402

LABELS = "_'ABCD E"  # 8 classes


def _reference_package(mods, hidden, layers):
    """Assemble a torch.save package with the reference's exact state_dict
    key names (reference model.py:183-341, 426-450)."""
    conv1, bn1, conv2, bn2, rnns, bns, fc_bn, fc = mods
    sd = {}

    def put_bn(prefix, bn):
        sd[prefix + "weight"] = bn.weight.detach()
        sd[prefix + "bias"] = bn.bias.detach()
        sd[prefix + "running_mean"] = bn.running_mean
        sd[prefix + "running_var"] = bn.running_var

    sd["conv.seq_module.0.weight"] = conv1.weight.detach()
    sd["conv.seq_module.0.bias"] = conv1.bias.detach()
    put_bn("conv.seq_module.1.", bn1)
    sd["conv.seq_module.3.weight"] = conv2.weight.detach()
    sd["conv.seq_module.3.bias"] = conv2.bias.detach()
    put_bn("conv.seq_module.4.", bn2)
    for i, rnn in enumerate(rnns):
        for name in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0",
                     "bias_hh_l0", "weight_ih_l0_reverse",
                     "weight_hh_l0_reverse", "bias_ih_l0_reverse",
                     "bias_hh_l0_reverse"):
            sd[f"rnns.{i}.rnn.{name}"] = getattr(rnn, name).detach()
        if bns[i] is not None:
            put_bn(f"rnns.{i}.batch_norm.module.", bns[i])
    put_bn("fc.0.module.0.", fc_bn)
    sd["fc.0.module.1.weight"] = fc.weight.detach()

    return {
        "version": "0.0.1", "hidden_size": hidden, "hidden_layers": layers,
        "rnn_type": "gru", "audio_conf": {"sample_rate": 16000,
                                          "window_size": 0.02},
        "labels": LABELS, "state_dict": sd, "bnm": 0.1,
        "bidirectional": True, "dropout": 0, "cnn_width": 0,
        "epoch": 3, "checkpoint": 2,
        "loss_results": torch.tensor([3.0, 2.0, 1.0]),
        "wer_results": torch.tensor([50.0, 40.0, 30.0]),
        "cer_results": torch.tensor([20.0, 15.0, 10.0]),
    }


def test_import_and_forward_parity(tmp_path):
    hidden, layers = 24, 2
    b, t = 2, 33
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, 161, t)).astype(np.float32) * 0.5
    lengths = [33, 21]
    for i, L in enumerate(lengths):
        x[i, :, L:] = 0

    mods = _build_torch_replica(hidden, layers, len(LABELS))
    # randomize running stats so eval-mode BN is a real test
    gen = torch.Generator().manual_seed(7)
    for m in (mods[1], mods[3], mods[6], *[m for m in mods[5] if m]):
        m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen)
                             * 0.1)
        m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen)
                            + 0.5)

    tpkg = _reference_package(mods, hidden, layers)
    tpath = tmp_path / "ref.pth"
    torch.save(tpkg, str(tpath))

    # CLI-level conversion
    from deepspeech_tpu.cli.import_torch import main as import_main
    out = str(tmp_path / "native.ckpt")
    assert import_main([str(tpath), out]) == 0

    # load through the real inference path and compare forward outputs
    from deepspeech_tpu.cli.common import load_inference_model
    model, state, labels, audio_conf, package = load_inference_model(out)
    assert labels.labels == LABELS
    assert package["loss_results"] == [3.0, 2.0, 1.0]
    assert package["epoch"] == 3

    logits, probs, out_lens = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), jnp.asarray(lengths), False)
    want_logits, want_lens = _torch_forward(mods, torch.tensor(x), lengths)
    np.testing.assert_array_equal(np.asarray(out_lens), want_lens)
    got = np.asarray(logits)
    for i, L in enumerate(want_lens):
        np.testing.assert_allclose(got[i, :L], want_logits[i, :L],
                                   rtol=2e-3, atol=2e-3)


def test_import_rejects_dead_code_variants():
    # glu_large / cnn_jasper are unrunnable dead code in the reference —
    # no real checkpoints can exist, so the importer refuses them
    with pytest.raises(NotImplementedError):
        convert_package({"rnn_type": "glu_large", "hidden_size": 8,
                         "hidden_layers": 1, "labels": "ab",
                         "state_dict": {}, "bidirectional": True})


def test_import_cnn_rejects_malformed_state_dict():
    with pytest.raises(ValueError):
        convert_package({"rnn_type": "cnn", "hidden_size": 8,
                         "hidden_layers": 1, "labels": "ab",
                         "state_dict": {}, "bidirectional": True})


# ---------------------------------------------------------------------------
# CNN-family import: drive the ACTUAL reference model.py under torch
# ---------------------------------------------------------------------------

def _load_reference_model():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_model", "/root/reference/model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("rnn_type,bidirectional,kw", [
    ("cnn", True, dict(rnn_hidden_size=24, nb_layers=2, cnn_width=16)),
    ("cnn", False, dict(rnn_hidden_size=24, nb_layers=2, cnn_width=16)),
    ("cnn_residual", True, dict(rnn_hidden_size=24, nb_layers=2,
                                cnn_width=16)),
    ("glu_small", True, dict(rnn_hidden_size=24, nb_layers=4, cnn_width=0)),
    ("large_cnn", True, dict(rnn_hidden_size=24, nb_layers=2, cnn_width=0)),
])
def test_import_cnn_variants_forward_parity(rnn_type, bidirectional, kw):
    """Instantiate the reference's own CNN model, serialize with ITS
    serialize(), convert, and assert forward parity. The reference forward
    is bypassed only for its unconditional CUDA assert (model.py:344) — the
    CNN branch is exactly rnns -> fc (model.py:348-353)."""
    ref = _load_reference_model()
    rnn_key = rnn_type  # string keys are what checkpoints carry

    torch.manual_seed(0)
    m = ref.DeepSpeech(rnn_type=rnn_key, labels=LABELS,
                       bidirectional=bidirectional, bnm=0.1, dropout=0,
                       audio_conf={"sample_rate": 16000,
                                   "window_size": 0.02}, **kw)
    m.eval()
    pkg = ref.DeepSpeech.serialize(m)

    native = convert_package(pkg)
    from deepspeech_tpu.models.factory import model_from_meta
    from deepspeech_tpu.train import checkpoint as ckpt

    model = model_from_meta(native)
    params = native["state"]["params"] if "state" in native else None
    # go through the real save/load path
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.ckpt")
        ckpt.save(path, native)
        loaded = ckpt.load(path)
        params = loaded["params"]
        batch_stats = loaded["batch_stats"]

    t = 37
    rng = np.random.default_rng(0)
    spect = rng.standard_normal((161, t)).astype(np.float32)

    with torch.no_grad():
        y = m.fc(m.rnns(torch.from_numpy(spect[None])))     # (1, C, T')
        ref_logits = y.transpose(1, 2).numpy()[0]

    logits, _, out_lens = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(spect)[None], jnp.asarray([t]), False)
    got = np.asarray(logits)[0, : int(out_lens[0])]
    assert got.shape == ref_logits.shape, (got.shape, ref_logits.shape)
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)


def test_import_unidirectional_then_stream(tmp_path):
    """A reference-format UNIDIRECTIONAL checkpoint (lookahead head,
    reference model.py:329-333) imports and then drives the streaming
    runtime, whose chunked logits match the imported model's batch forward
    — the import -> serve integration path end to end."""
    hidden, layers, ctx = 16, 1, 20
    torch.manual_seed(11)
    sd = {}

    def put_bn(prefix, n):
        sd[prefix + "weight"] = torch.rand(n) + 0.5
        sd[prefix + "bias"] = torch.randn(n) * 0.1
        sd[prefix + "running_mean"] = torch.randn(n) * 0.1
        sd[prefix + "running_var"] = torch.rand(n) + 0.5

    sd["conv.seq_module.0.weight"] = torch.randn(32, 1, 41, 11) * 0.05
    sd["conv.seq_module.0.bias"] = torch.randn(32) * 0.1
    put_bn("conv.seq_module.1.", 32)
    sd["conv.seq_module.3.weight"] = torch.randn(32, 32, 21, 11) * 0.02
    sd["conv.seq_module.3.bias"] = torch.randn(32) * 0.1
    put_bn("conv.seq_module.4.", 32)
    rnn_in = 32 * 41
    for name, shape in (("weight_ih_l0", (3 * hidden, rnn_in)),
                        ("weight_hh_l0", (3 * hidden, hidden)),
                        ("bias_ih_l0", (3 * hidden,)),
                        ("bias_hh_l0", (3 * hidden,))):
        sd[f"rnns.0.rnn.{name}"] = torch.randn(*shape) * 0.05
    sd["lookahead.0.weight"] = torch.randn(hidden, ctx + 1) * 0.1
    put_bn("fc.0.module.0.", hidden)
    sd["fc.0.module.1.weight"] = torch.randn(len(LABELS), hidden) * 0.1

    tpkg = {"version": "0.0.1", "hidden_size": hidden,
            "hidden_layers": layers, "rnn_type": "gru",
            "audio_conf": {"sample_rate": 16000, "window_size": 0.02},
            "labels": LABELS, "state_dict": sd, "bnm": 0.1,
            "bidirectional": False, "dropout": 0, "cnn_width": 0}
    tpath = tmp_path / "uni.pth"
    torch.save(tpkg, str(tpath))

    from deepspeech_tpu.cli.import_torch import main as import_main
    out = str(tmp_path / "uni.ckpt")
    assert import_main([str(tpath), out]) == 0

    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.audio.features import featurize_batch
    from deepspeech_tpu.cli.common import load_inference_model
    from deepspeech_tpu.serve import StreamingTranscriber
    from deepspeech_tpu.text import Labels
    model, state, labels, audio_conf, _ = load_inference_model(out)
    assert not model.bidirectional

    rng = np.random.default_rng(3)
    n = int(16000 * 1.1)
    y = (0.3 * np.sin(2 * np.pi * 350 * np.arange(n) / 16000)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    conf = AudioConf()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    spect, fl = featurize_batch(jnp.asarray(y)[None], jnp.asarray([n]),
                                conf, normalize="none")
    logits, _, out_lens = model.apply(variables, spect, fl, False)
    ref = np.asarray(logits)[0, : int(out_lens[0])]

    st = StreamingTranscriber(model, variables, labels, conf,
                              normalize="none", chunk_frames=32)
    st.feed(y)
    st.finish()
    got = st.collected_logits()[0]
    t = min(len(ref), len(got))
    np.testing.assert_allclose(got[:t], ref[:t], rtol=2e-3, atol=2e-3)
