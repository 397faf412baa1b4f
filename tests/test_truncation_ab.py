"""Pin the MeTRo paper's headline qualitative result (VERDICT r4 next-#3).

A trained metric-volumetric model (`metro`) must beat a trained
image-aligned 2.5D baseline (`twofive`) on HIDDEN joints (projecting
outside the crop) under progressive truncation — the architectural reason
MeTRo exists (SURVEY.md §7 "Truncation robustness"). The 2.5D head's x/y
soft-argmax is bounded to the crop, so out-of-crop joints clamp to the
border; the metric head keeps decoding them at metric positions.

Runs the real A/B receipt script (scripts/exp_truncation_ab.py) at CPU
scale: tiny backbone @64, 300 steps each model, synthetic data. The chip
receipt (resnet18 @128, 3000 steps) lives in BASELINE.md round-5; CPU
probe of the same harness (2026-08-20): hidden-joint MPJPE at truncation
0.3/0.4/0.5 = 312/327/312 mm (metro) vs 588/594/527 (twofive), ratios
1.9/1.8/1.7 — asserted here at >=1.2 to absorb training noise.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_metro_beats_twofive_on_hidden_joints_under_truncation(tmp_path):
    from exp_truncation_ab import main as ab_main

    out = tmp_path / "trunc_ab.json"
    ab_main([
        "--cpu", "--backbone", "tiny", "--proc-side", "64",
        "--steps", "300", "--batch-size", "16", "--n-train", "256",
        "--n-eval", "32", "--cycle-batches", "8", "--out", str(out),
    ])
    report = json.loads(out.read_text())
    rel = report["hidden_joint_relation"]
    # the relation must hold at every truncation level that produces
    # hidden joints (>= 0.3 with the synthetic boxes)
    checked = 0
    for frac, row in rel.items():
        if float(frac) < 0.3:
            continue
        checked += 1
        assert row["twofive_hidden"] > 1.2 * row["metro_hidden"], (
            f"truncation {frac}: twofive hidden-joint MPJPE "
            f"{row['twofive_hidden']:.0f} mm should exceed 1.2x metro's "
            f"{row['metro_hidden']:.0f} mm — the truncation-robustness "
            f"relation the architecture exists for")
    assert checked >= 2, f"expected >=2 truncation levels with hidden joints, got {checked}"

    # sanity: at zero truncation both models see every joint and the
    # visible-joint errors are in the same regime (no degenerate baseline)
    m0 = report["models"]["metro"]["truncation"]["0.0"]
    t0 = report["models"]["twofive"]["truncation"]["0.0"]
    assert m0["n_visible"] == 1.0 and t0["n_visible"] == 1.0
    assert t0["mpjpe"] < 3.0 * m0["mpjpe"], (
        "twofive baseline failed to train at all — the hidden-joint "
        "comparison would be meaningless")
