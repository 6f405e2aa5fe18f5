"""Import a reference (torch) DeepSpeech checkpoint into this framework.

The reference saves a self-describing ``torch.save`` package (reference
model.py:426-468: hidden_size/hidden_layers/rnn_type/labels/audio_conf +
``state_dict``). This CLI converts the DS2-branch weights
(rnn_type rnn|gru|lstm; reference model.py:183-380) into our flax parameter
tree — weight-for-weight, so greedy decodes match the torch model bit-for-bit
up to float32 matmul ordering — and writes a native checkpoint usable by
``test.py``/``transcribe.py``/``train.py --continue-from``.

Key mapping (reference state_dict -> our tree):
  conv.seq_module.0/.3 Conv2d (O,I,Kf,Kt)  -> conv/conv{0,1} kernel (Kf,Kt,I,O)
  conv.seq_module.1/.4 BatchNorm2d         -> conv/bn{0,1} + batch_stats
  rnns.{i}.rnn.weight_ih_l0[_reverse] (G*H,F) -> rnn{i}/w_ih (D,F,G*H)
  rnns.{i}.rnn.weight_hh_l0[_reverse] (G*H,H) -> rnn{i}/w_hh (D,H,G*H)
  rnns.{i}.rnn.bias_{ih,hh}_l0[_reverse]      -> rnn{i}/b_{ih,hh} (D,G*H)
  rnns.{i}.batch_norm.module.* (i>0)          -> rnn{i}/bn + batch_stats
  lookahead.0.weight (H,context+1)            -> lookahead/weight
  fc.0.module.0.* BatchNorm1d                 -> fc_bn + batch_stats
  fc.0.module.1.weight (C,H) Linear           -> fc/kernel (H,C)

The 1312-feature order of the conv->rnn boundary matches the reference's
``view(B, 32*41, T)`` channel-major collapse by construction (models/ds2.py).
"""

from __future__ import annotations

import argparse

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def convert_state_dict(sd: dict, hidden_layers: int, bidirectional: bool):
    """Reference DS2 state_dict -> (params, batch_stats) numpy trees."""
    params: dict = {"conv": {}}
    stats: dict = {"conv": {}}

    def bn(dst_p, dst_s, prefix):
        dst_p["scale"] = _np(sd[prefix + "weight"])
        dst_p["bias"] = _np(sd[prefix + "bias"])
        dst_s["mean"] = _np(sd[prefix + "running_mean"])
        dst_s["var"] = _np(sd[prefix + "running_var"])

    for j, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        params["conv"][f"conv{j}"] = {
            "kernel": _np(sd[f"conv.seq_module.{ci}.weight"])
            .transpose(2, 3, 1, 0),
            "bias": _np(sd[f"conv.seq_module.{ci}.bias"]),
        }
        params["conv"][f"bn{j}"] = {}
        stats["conv"][f"bn{j}"] = {}
        bn(params["conv"][f"bn{j}"], stats["conv"][f"bn{j}"],
           f"conv.seq_module.{bi}.")

    dirs = ("", "_reverse") if bidirectional else ("",)
    for i in range(hidden_layers):
        pre = f"rnns.{i}.rnn."
        r = {
            "w_ih": np.stack([_np(sd[pre + f"weight_ih_l0{s}"]).T
                              for s in dirs]),
            "w_hh": np.stack([_np(sd[pre + f"weight_hh_l0{s}"]).T
                              for s in dirs]),
            "b_ih": np.stack([_np(sd[pre + f"bias_ih_l0{s}"]) for s in dirs]),
            "b_hh": np.stack([_np(sd[pre + f"bias_hh_l0{s}"]) for s in dirs]),
        }
        bn_pre = f"rnns.{i}.batch_norm.module."
        if bn_pre + "weight" in sd:
            r["bn"] = {}
            stats[f"rnn{i}"] = {"bn": {}}
            bn(r["bn"], stats[f"rnn{i}"]["bn"], bn_pre)
        params[f"rnn{i}"] = r

    if "lookahead.0.weight" in sd:
        params["lookahead"] = {"weight": _np(sd["lookahead.0.weight"])}

    params["fc_bn"] = {}
    stats["fc_bn"] = {}
    bn(params["fc_bn"], stats["fc_bn"], "fc.0.module.0.")
    params["fc"] = {"kernel": _np(sd["fc.0.module.1.weight"]).T}
    return params, stats


CNN_IMPORT_KEYS = ("cnn", "cnn_residual", "glu_small", "large_cnn")


def _natsort(key: str):
    return [int(t) if t.isdigit() else t for t in key.split(".")]


def convert_cnn_state_dict(sd: dict, blocks):
    """Reference CNN-family state_dict -> our ConvStack params/batch_stats.

    Works for every runnable CNN variant by walking the torch keys in
    natural order instead of hard-coding each module tree: a 3-D ``.weight``
    under ``rnns.`` is the next block's Conv1d (reference Wav2Letter is a
    flat Sequential, model.py:506-562; ResidualWav2Letter / SmallGLU /
    LargeCNN nest ``layers.N.conv``), a ``.running_mean`` is its BatchNorm,
    and ``_se_reduce``/``_se_expand`` 1x1 convs attach squeeze-excitation to
    the block sharing their prefix (ResCNNBlock, model.py:674-723). The
    unused DS2 conv stack the reference always builds (``conv.seq_module``,
    model.py:208-215) is ignored.
    """
    sd = {k: _np(v) for k, v in sd.items()}
    convs, bns = [], []
    se: dict = {}
    for k in sorted((k for k in sd if k.startswith("rnns.")), key=_natsort):
        if k.endswith(".running_mean"):
            bns.append(k[: -len("running_mean")])
        elif k.endswith(".weight") and sd[k].ndim == 3:
            base = k[: -len("weight")]
            if "_se_reduce." in k or "_se_expand." in k:
                blockp = base.rsplit("_se_", 1)[0]
                which = "reduce" if "_se_reduce." in k else "expand"
                se.setdefault(blockp, {})[which] = (sd[k],
                                                    sd.get(base + "bias"))
            else:
                blockp = base[: -len("conv.")] if base.endswith("conv.") \
                    else base
                convs.append((blockp, sd[k], sd.get(base + "bias")))
    if len(convs) != len(blocks) or len(bns) != len(blocks):
        raise ValueError(
            f"checkpoint has {len(convs)} convs / {len(bns)} batchnorms but "
            f"the {len(blocks)}-block architecture was expected")
    params: dict = {}
    stats: dict = {}
    for i, (blockp, w, b) in enumerate(convs):
        # torch Conv1d (out, in, k) -> flax Conv kernel (k, in, out)
        p: dict = {"conv": {"kernel": np.ascontiguousarray(
            w.transpose(2, 1, 0))}}
        if b is not None:
            p["conv"]["bias"] = b
        bnp = bns[i]
        p["bn"] = {"scale": sd[bnp + "weight"], "bias": sd[bnp + "bias"]}
        stats[f"block{i}"] = {"bn": {"mean": sd[bnp + "running_mean"],
                                     "var": sd[bnp + "running_var"]}}
        if blockp in se:
            (rw, rb) = se[blockp]["reduce"]
            (ew, eb) = se[blockp]["expand"]
            # 1x1 Conv1d (out, in, 1) -> Dense kernel (in, out)
            p["se_reduce"] = {"kernel": np.ascontiguousarray(rw[:, :, 0].T),
                              "bias": rb}
            p["se_expand"] = {"kernel": np.ascontiguousarray(ew[:, :, 0].T),
                              "bias": eb}
        params[f"block{i}"] = p
    # head: fc.0 is Conv1d(size -> num_classes, k=1) (model.py:232-234)
    params["fc"] = {"kernel": np.ascontiguousarray(
        sd["fc.0.weight"].transpose(2, 1, 0)), "bias": sd["fc.0.bias"]}
    return params, stats


def convert_package(tpkg: dict) -> dict:
    """Reference torch package -> our checkpoint package."""
    from deepspeech_tpu.models.factory import RNN_KEYS
    from deepspeech_tpu.train import checkpoint as ckpt

    rnn_type = tpkg["rnn_type"]
    if not isinstance(rnn_type, str):  # older saves stored the nn class
        rnn_type = rnn_type.__name__.lower()
    labels = tpkg["labels"]
    bidirectional = bool(tpkg.get("bidirectional", True))
    hidden_layers = int(tpkg["hidden_layers"])
    if rnn_type in RNN_KEYS:
        params, stats = convert_state_dict(tpkg["state_dict"], hidden_layers,
                                           bidirectional)
    elif rnn_type in CNN_IMPORT_KEYS:
        from deepspeech_tpu.models.cnn import build_cnn_model
        model = build_cnn_model(
            rnn_type, num_classes=len(labels),
            cnn_width=int(tpkg.get("cnn_width", 0) or 256),
            hidden_size=int(tpkg["hidden_size"]),
            hidden_layers=hidden_layers,
            bnm=float(tpkg.get("bnm", 0.1)),
            # reference overloads bidirectional=False as "use GLU"
            # (model.py:228 'not_glu': _bidirectional)
            use_glu=not bidirectional)
        params, stats = convert_cnn_state_dict(tpkg["state_dict"],
                                               model.blocks)
    else:
        raise NotImplementedError(
            f"torch import supports {RNN_KEYS + CNN_IMPORT_KEYS}; "
            f"got rnn_type={rnn_type!r} (glu_large / cnn_jasper are dead "
            f"code in the reference — no real checkpoints exist)")
    meta = {
        "rnn_type": rnn_type, "num_classes": len(labels),
        "hidden_size": int(tpkg["hidden_size"]),
        "hidden_layers": hidden_layers, "bidirectional": bidirectional,
        "bnm": float(tpkg.get("bnm", 0.1)),
        "cnn_width": int(tpkg.get("cnn_width", 0) or 0),
        "dropout": float(tpkg.get("dropout", 0) or 0), "context": 20,
    }

    class _State:
        pass

    s = _State()
    s.params, s.batch_stats = params, stats
    s.opt_state = {}
    s.step = np.zeros((), np.int32)
    history = {k: [float(x) for x in np.asarray(tpkg[k]).ravel()]
               for k in ("loss_results", "wer_results", "cer_results")
               if tpkg.get(k) is not None}
    epoch = tpkg.get("epoch")
    return ckpt.serialize(
        meta, s, labels, dict(tpkg.get("audio_conf") or {}),
        epoch=None if epoch is None else epoch - 1,
        iteration=tpkg.get("iteration"), checkpoint=tpkg.get("checkpoint"),
        avg_loss=tpkg.get("avg_loss"), history=history or None)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="convert a reference torch DeepSpeech checkpoint to the "
                    "native format")
    p.add_argument("torch_checkpoint")
    p.add_argument("output")
    args = p.parse_args(argv)

    import torch

    from deepspeech_tpu.train import checkpoint as ckpt

    tpkg = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    pkg = convert_package(tpkg)
    ckpt.save(args.output, pkg)
    print(f"wrote {args.output} (rnn_type={pkg['rnn_type']}, "
          f"hidden={pkg['hidden_size']}x{pkg['hidden_layers']}, "
          f"classes={pkg['num_classes']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
