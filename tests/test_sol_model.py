"""The speed-of-light model (benches/sol_model.py) stays runnable and
self-consistent.

The model is documentation-grade arithmetic (BENCHMARKS.md round-5
"Speed-of-light accounting"), but it encodes load-bearing kernel facts —
grid-step shapes, per-stage op counts, HBM bytes — so this pins:
  * it runs and emits valid JSON for both record legs,
  * the structural invariants hold (grid steps divide T, byte counts
    match the layout arithmetic, the AGC leg models more work than the
    off leg per row),
  * the published conclusions stay true of the committed anchors
    (AGC-on at ~VPU floor, AGC-off within the VPU+DMA sum).
"""
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _run_model():
    out = subprocess.run(
        [sys.executable, str(ROOT / "benches" / "sol_model.py")],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def test_sol_model_runs_and_is_consistent():
    legs = _run_model()
    assert set(legs) == {"agc_off_i8_m4", "agc_on_int2_m2_rel0b16"}

    off = legs["agc_off_i8_m4"]
    on = legs["agc_on_int2_m2_rel0b16"]

    # grid-step shapes: mto = m * 160, steps divide T=12800 exactly
    for leg in (off, on):
        assert leg["mto"] == leg["m"] * 160
        assert leg["grid_steps_per_block"] * leg["mto"] == 12800
        assert all(v > 0 for v in leg["ops_per_grid_step"].values())
        assert leg["total_vreg_row_ops"] == sum(
            leg["ops_per_grid_step"].values())

    # HBM layout arithmetic: i8 = 2 B/sample over [m, fr_p=152, 1024]
    # chunks + the [T, 8] f32 mix out; int2 adds the bf16 AGC ring
    # (read + write of [mto, 8, 128]).
    assert off["hbm_bytes_per_grid_step"] == (
        4 * 152 * 1024 * 2 + 640 * 8 * 4)
    assert on["hbm_bytes_per_grid_step"] == (
        2 * 152 * 1024 * 4 + 2 * 320 * 1024 * 2 + 320 * 8 * 4)

    # the AGC stage models strictly more vreg work per output row
    assert (on["total_vreg_row_ops"] / on["mto"]
            > off["total_vreg_row_ops"] / off["mto"] + 20)

    # both legs are modeled VPU-bound (DMA floor below the op floor)
    assert off["bound"] == "vpu" and on["bound"] == "vpu"

    # published conclusions vs the committed measured anchors:
    # AGC-on at ~the VPU issue floor; AGC-off within the op+DMA sum.
    assert 0.85 <= on["sol_fraction"] <= 1.2
    assert 0.6 <= off["sol_fraction"] <= 1.0
    assert 0.85 <= off["sol_fraction_dma_serialized"] <= 1.1
