"""HLO collective-inventory parsing (tools/collective_audit.py).

The analytic scaling audit's credibility rests on this parser: tuple
results summed fully, async start/done pairs counted once, wire pricing
per each op's OWN replica-group size. Pinned here on synthetic HLO lines;
the compile-and-audit integration runs via the tool's CLI (PERF.md
"Round 5: the analytic audit").
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from collective_audit import audit_hlo, shape_bytes  # noqa: E402


def test_shape_bytes():
    assert shape_bytes("f32[2,800,2400]") == 2 * 800 * 2400 * 4
    assert shape_bytes("bf16[128]") == 256
    assert shape_bytes("pred[]") == 1
    assert shape_bytes("u8[3,3]") == 9
    assert shape_bytes("not-a-shape") == 0


def test_audit_counts_tuples_and_async_pairs():
    txt = "\n".join([
        "  %ar = f32[100]{0} all-reduce(f32[100] %x), replica_groups={{0,1,2,3}}, to_apply=%add",
        "  %t = (f32[10,10]{1,0}, f32[50]{0}) all-reduce(%a, %b), replica_groups={{0,1}}, to_apply=%add",
        "  %s = ((f32[8]{0})) all-reduce-start(f32[8] %y), replica_groups={{0,1,2,3,4,5,6,7}}, to_apply=%add",
        "  %d = f32[8]{0} all-reduce-done(%s)",
        "  %ag = f32[16]{0} all-gather(f32[4] %z), replica_groups={{0,1,2,3}}, dimensions={0}",
        "  %cp = f32[4]{0} collective-permute(f32[4] %w), source_target_pairs={{0,1}}",
        "  not an op line",
    ])
    per = audit_hlo(txt, n_devices=8)
    assert per["all-reduce"]["count"] == 3  # start counted, done skipped
    assert per["all-reduce"]["bytes"] == 400 + (400 + 200) + 32
    # wire: ring 2(g-1)/g with per-op group sizes 4, 2, 8
    assert per["all-reduce"]["wire_bytes"] == \
        int(400 * 1.5) + int(600 * 1.0) + int(32 * 1.75)
    assert per["all-gather"]["count"] == 1
    assert per["all-gather"]["bytes"] == 64
    assert per["all-gather"]["wire_bytes"] == int(64 * 0.75)
    assert per["collective-permute"]["count"] == 1
    assert per["collective-permute"]["wire_bytes"] == 16


def test_model_axis_psum_priced_over_pairs_not_mesh():
    """A direction-sum psum on a 2-wide model axis of an 8-chip mesh must
    be priced as a 2-chip exchange (factor 1.0), not an 8-chip ring."""
    txt = ("  %p = f32[1000]{0} all-reduce(f32[1000] %h), "
           "replica_groups={{0,4},{1,5},{2,6},{3,7}}, to_apply=%add")
    per = audit_hlo(txt, n_devices=8)
    assert per["all-reduce"]["wire_bytes"] == 4000  # 2(2-1)/2 == 1.0
