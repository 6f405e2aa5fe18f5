"""Analytic DP/TP scaling audit: inventory the compiled train step's
collectives and bound the communication fraction.

The timing-based scaling proxy (bench.py --mode scaling) runs N virtual
CPU devices on a 2-core host, so its ratio confounds collective cost with
CPU oversubscription (r4 measured 0.80 against a 0.90 north star, r3
0.93 — the spread IS the host noise). This tool removes the confound by
not timing anything host-bound at all:

1. jit the real train step over a (data=N, model=M) virtual mesh and
   compile it (same GSPMD partitioner as a TPU pod);
2. walk the compiled HLO and sum the bytes moved by every collective
   (all-reduce / all-gather / reduce-scatter / collective-permute /
   all-to-all);
3. convert to seconds on the target interconnect (ring all-reduce moves
   2(N-1)/N x bytes per chip) and compare against the measured on-chip
   step time (BENCH step mode) for the analytic efficiency bound

       eff >= t_compute / (t_compute + t_comm)      (zero overlap)
       eff <= 1                                     (full overlap)

XLA overlaps grad all-reduces with the backward pass, so the truth sits
between the bounds; the ZERO-overlap bound landing above 0.90 settles the
north star without appealing to host behavior.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/collective_audit.py [data] [model]

Env: AUDIT_HIDDEN/AUDIT_LAYERS/AUDIT_BATCH/AUDIT_SECONDS mirror the bench
step config; AUDIT_ICI_GBPS sets the per-chip interconnect bandwidth
(default 45 GB/s per direction - TPU v5e ICI per link); AUDIT_STEP_MS the
measured single-chip step time (default 33.2 ms, BENCH r5 step mode).
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8,
                "s32": 4, "u64": 8, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    """'f32[2,800,2400]' -> bytes."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def audit_hlo(txt: str, n_devices: int = 8) -> dict:
    """Per-collective-kind (count, payload bytes, per-chip wire bytes)
    from compiled HLO text.

    Handles variadic collectives whose result is a TUPLE of shapes
    (one fused all-reduce over many grad tensors) by summing every
    element; `-done` halves of async pairs are skipped so split
    start/done ops are not double counted.

    Wire pricing is per op, per its OWN replica-group size g (parsed from
    ``replica_groups=``, so a model-axis psum over pairs is priced over 2
    chips, not the whole mesh): ring all-reduce moves 2(g-1)/g x payload
    per chip; all-gather / reduce-scatter (g-1)/g; permute/all-to-all 1x.
    """
    out = {k: {"count": 0, "bytes": 0, "wire_bytes": 0}
           for k in _COLLECTIVES}
    # one op per line:  %ar = (f32[800,2400]{1,0}, ...) all-reduce(...)
    op_pat = re.compile(r"\b(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\(")
    grp_pat = re.compile(r"replica_groups=\{?\{([0-9,]+)\}")
    for line in txt.splitlines():
        if "=" not in line:
            continue
        m = op_pat.search(line)
        if m is None or m.group(2) == "-done":
            continue
        kind = m.group(1)
        result = line.split("=", 1)[1][: m.start() - line.index("=") - 1]
        payload = sum(
            shape_bytes(s) for s in re.findall(r"[a-z0-9]+\[[0-9,]*\]",
                                               result))
        g = n_devices
        gm = grp_pat.search(line)
        if gm:
            g = max(1, gm.group(1).count(",") + 1)
        if kind == "all-reduce":
            factor = 2 * (g - 1) / g
        elif kind in ("all-gather", "reduce-scatter"):
            factor = (g - 1) / g
        else:
            factor = 1.0
        out[kind]["count"] += 1
        out[kind]["bytes"] += payload
        out[kind]["wire_bytes"] += int(payload * factor)
    return out


def build_compiled_step(data: int, model: int):
    import jax
    import jax.numpy as jnp

    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.models import DeepSpeech2
    from deepspeech_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              make_state_shardings)
    from deepspeech_tpu.train import (StepConfig, TrainState,
                                      build_optimizer, make_train_step)

    hidden = int(os.environ.get("AUDIT_HIDDEN", 800))
    layers = int(os.environ.get("AUDIT_LAYERS", 6))
    # per-chip batch (the bench config); global batch scales with `data`
    # like a real DP run, so activation-stat collectives are sized honestly
    batch = int(os.environ.get("AUDIT_BATCH", 20)) * data
    seconds = float(os.environ.get("AUDIT_SECONDS", 7.5))
    mesh = make_mesh(data=data, model=model,
                     devices=jax.devices()[: data * model])
    jax.set_mesh(mesh)
    model_m = DeepSpeech2(num_classes=30, hidden_size=hidden,
                          hidden_layers=layers, cell="gru",
                          bidirectional=True, compute_dtype=jnp.bfloat16)
    tx = build_optimizer("sgd", lr=3e-4, momentum=0.9, max_norm=100.0)
    variables = model_m.init(jax.random.PRNGKey(0), jnp.zeros((1, 161, 51)),
                             jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)
    nparams = sum(int(np.prod(p.shape))
                  for p in jax.tree_util.tree_leaves(state.params))
    step = make_train_step(model_m, tx, StepConfig(audio_conf=AudioConf()),
                           donate=False)
    ns = int(16000 * seconds)
    bsh = batch_sharding(mesh)
    batch_args = {
        "audio": jax.ShapeDtypeStruct((batch, ns), jnp.float32, sharding=bsh),
        "audio_lengths": jax.ShapeDtypeStruct((batch,), jnp.int32,
                                              sharding=bsh),
        "targets": jax.ShapeDtypeStruct((batch, 96), jnp.int32, sharding=bsh),
        "target_lengths": jax.ShapeDtypeStruct((batch,), jnp.int32,
                                               sharding=bsh),
    }
    st_sh = make_state_shardings(mesh, state)
    state_args = jax.tree.map(
        lambda leaf, sh: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                              sharding=sh),
        state, st_sh)
    rng_arg = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = step.lower(state_args, batch_args, rng_arg).compile()
    return compiled, nparams


def dump_top_shapes(txt: str, top: int = 12):
    """Largest individual collectives (debugging what XLA chose to move)."""
    op_pat = re.compile(r"\b(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\(")
    rows = []
    for line in txt.splitlines():
        if "=" not in line:
            continue
        m = op_pat.search(line)
        if m is None or m.group(2) == "-done":
            continue
        result = line.split("=", 1)[1][: m.start() - line.index("=") - 1]
        shapes = re.findall(r"[a-z0-9]+\[[0-9,]*\]", result)
        rows.append((sum(shape_bytes(s) for s in shapes), m.group(1), shapes))
    rows.sort(reverse=True)
    for b, kind, shapes in rows[:top]:
        print(f"  {b/1e6:8.2f} MB  {kind}  "
              f"{shapes[:4]}{'...' if len(shapes) > 4 else ''}",
              file=sys.stderr)


def main():
    data = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    model = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    compiled, nparams = build_compiled_step(data, model)
    txt = compiled.as_text()
    if os.environ.get("AUDIT_DUMP_SHAPES"):
        dump_top_shapes(txt)
    per = audit_hlo(txt, n_devices=data * model)
    total_bytes = sum(v["bytes"] for v in per.values())
    wire = sum(v["wire_bytes"] for v in per.values())

    ici = float(os.environ.get("AUDIT_ICI_GBPS", 45.0)) * 1e9
    step_ms = float(os.environ.get("AUDIT_STEP_MS", 33.2))
    t_comm_ms = wire / ici * 1e3
    eff_zero_overlap = step_ms / (step_ms + t_comm_ms)
    print(json.dumps({
        "mesh": {"data": data, "model": model},
        "params": nparams,
        "collectives": per,
        "collective_payload_bytes": total_bytes,
        "wire_bytes_per_chip_ring": wire,
        "ici_gbps_assumed": ici / 1e9,
        "measured_step_ms": step_ms,
        "t_comm_ms": round(t_comm_ms, 3),
        "dp_efficiency_zero_overlap_bound": round(eff_zero_overlap, 4),
    }))


if __name__ == "__main__":
    main()
