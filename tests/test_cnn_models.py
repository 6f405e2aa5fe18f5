"""CNN model family: shapes, length arithmetic, masking, factory roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.models import build_model, model_from_meta
from deepspeech_tpu.models.cnn import conv1d_out_length, glu

B, T, C = 2, 100, 30


def init_and_run(model, t=T, train=False):
    spect = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((B, 161, t)).astype(np.float32))
    lengths = jnp.asarray([t, t // 2])
    variables = model.init(jax.random.PRNGKey(0), spect, lengths, False)
    rngs = {"dropout": jax.random.PRNGKey(1)} if train else {}
    out, _ = model.apply(variables, spect, lengths, train,
                         mutable=["batch_stats"], rngs=rngs)
    return out


class TestConvArithmetic:
    def test_conv1d_out_length(self):
        l = jnp.asarray([100])
        assert int(conv1d_out_length(l, 13, 2, 6)[0]) == 50
        assert int(conv1d_out_length(l, 3, 1, 1)[0]) == 100
        assert int(conv1d_out_length(l, 4, 1, 2)[0]) == 101
        assert int(conv1d_out_length(l, 29, 1, 56, dilation=4)[0]) == 100

    def test_glu(self):
        x = jnp.asarray([[1.0, 2.0, 0.0, 0.0]])
        out = glu(x)
        np.testing.assert_allclose(np.asarray(out), [[0.5, 1.0]], atol=1e-6)


@pytest.mark.parametrize("variant,kw", [
    ("cnn", dict(hidden_size=64, hidden_layers=2, cnn_width=32)),
    ("cnn", dict(hidden_size=64, hidden_layers=2, cnn_width=32,
                 bidirectional=False)),  # GLU mode
    ("cnn_residual", dict(hidden_size=64, hidden_layers=2, cnn_width=32)),
    ("glu_small", dict(hidden_layers=3)),
    ("large_cnn", dict()),
    ("cnn_jasper", dict()),
])
class TestVariants:
    def test_forward_shapes(self, variant, kw):
        model, meta = build_model(variant, num_classes=C, dropout=0.1, **kw)
        logits, probs, out_lens = init_and_run(model)
        assert logits.shape[0] == B and logits.shape[2] == C
        assert probs.shape == logits.shape
        assert int(out_lens[0]) <= logits.shape[1]
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)

    def test_train_mode_with_dropout(self, variant, kw):
        model, _ = build_model(variant, num_classes=C, dropout=0.2, **kw)
        logits, _, _ = init_and_run(model, train=True)
        assert np.isfinite(np.asarray(logits)).all()

    def test_meta_roundtrip(self, variant, kw):
        model, meta = build_model(variant, num_classes=C, **kw)
        rebuilt = model_from_meta(meta)
        spect = jnp.zeros((1, 161, 50))
        v1 = model.init(jax.random.PRNGKey(0), spect, jnp.asarray([50]), False)
        v2 = rebuilt.init(jax.random.PRNGKey(0), spect, jnp.asarray([50]), False)
        assert jax.tree.structure(v1) == jax.tree.structure(v2)


class TestMasking:
    def test_padding_does_not_leak(self):
        """Same utterance with different bucket padding -> same valid logits
        (the conv stack is masked; BN stats do differ with padding in the
        reference's design, so compare in eval mode)."""
        model, _ = build_model("cnn", num_classes=C, hidden_size=32,
                               hidden_layers=1, cnn_width=16)
        rng = np.random.default_rng(1)
        audio = rng.standard_normal((1, 161, 60)).astype(np.float32)
        short = jnp.asarray(audio)
        long = jnp.asarray(np.pad(audio, ((0, 0), (0, 0), (0, 40))))
        lengths = jnp.asarray([60])
        variables = model.init(jax.random.PRNGKey(0), short, lengths, False)
        l1, _, n1 = model.apply(variables, short, lengths, False)
        l2, _, n2 = model.apply(variables, long, lengths, False)
        assert int(n1[0]) == int(n2[0])
        np.testing.assert_allclose(np.asarray(l1[0, : int(n1[0])]),
                                   np.asarray(l2[0, : int(n1[0])]),
                                   atol=2e-4)

    def test_glu_length_tracking(self):
        """glu_small has k=4,p=2 layers that grow length by 1; the tracked
        lengths must follow the real conv arithmetic."""
        model, _ = build_model("glu_small", num_classes=C, hidden_layers=3)
        logits, _, out_lens = init_and_run(model)
        # layers: (13,1,6)=same, (3,1,1)=same, (4,1,2)=+1
        assert int(out_lens[0]) == T + 1


class TestFactory:
    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            build_model("transformer", num_classes=C)

    def test_rnn_key_builds_ds2(self):
        model, meta = build_model("gru", num_classes=C, hidden_size=16,
                                  hidden_layers=1)
        assert meta["rnn_type"] == "gru"
        logits, probs, out_lens = init_and_run(model, t=40)
        assert logits.shape[2] == C
