"""Performance-regression gate (SURVEY.md §4: the reference *designed* a
benchmark-with-tolerance harness at architecture-redesign-gameplan.md:1031-1058
but never implemented it; this is that harness, live).

Gated on SPT_TEST_TPU=1 — throughput assertions are only meaningful on the
real chip; the default CPU suite skips them.

r4 change (VERDICT r3 weak #5): the floor for each metric is the HIGH-WATER
MARK ever recorded (BENCH_HWM.json, raised automatically by full
bench_suite runs), derated by 6% — not the previous round's recording
derated by 10%, under which a 6% drift per round passed silently forever.
The headline gate also checks the PATH-SEGMENTS-ONLY accounting against
its own mark, so the 500M BASELINE floor cannot silently lean on NEE
shadow-ray counting.
"""

import json
import os

import pytest

TPU = os.environ.get("SPT_TEST_TPU") == "1"
pytestmark = pytest.mark.skipif(
    not TPU, reason="throughput gate needs the real TPU (SPT_TEST_TPU=1)")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DERATE = 1.06  # fail on >6% regression from the best ever recorded


def _hwm():
    with open(os.path.join(_ROOT, "BENCH_HWM.json")) as f:
        return json.load(f)["hwm"]


def _check(now: float, key: str):
    mark = _hwm().get(key)
    if not mark:
        pytest.skip(f"no high-water mark for {key}")
    assert now * DERATE >= mark, (
        f"{key} regression: {now:.4g} < {mark:.4g}/{DERATE} "
        f"(high-water mark in BENCH_HWM.json)")


def test_cornell_forward_throughput():
    """Config 2 forward rays/s vs its high-water mark (6% tolerance)."""
    import bench_suite
    bench_suite.enable_compile_cache()  # TPU-serialized entries only here
    now = bench_suite.bench_config2(quick=False)
    bench_suite.update_hwm({"config2_rays_per_s": now["rays_per_s"]})
    _check(now["rays_per_s"], "config2_rays_per_s")


def test_fwd_bwd_meets_baseline_target():
    """The headline metric must hold the BASELINE.md 500M rays/s floor,
    undiluted, at the recorded (full) spp — and stay within 6% of its
    high-water mark under BOTH ray accountings."""
    import bench_suite
    bench_suite.enable_compile_cache()  # TPU-serialized entries only here
    now = bench_suite.bench_config3(quick=False)
    assert now["fwd_bwd_rays_per_s"] >= 500e6, (
        f"fwd+bwd {now['fwd_bwd_rays_per_s']:.3g} below the 500M target")
    bench_suite.update_hwm(
        {"config3_fwd_rays_per_s": now.get("fwd_rays_per_s"),
         "config3_fwd_bwd_rays_per_s": now["fwd_bwd_rays_per_s"]})
    _check(now["fwd_bwd_rays_per_s"], "config3_fwd_bwd_rays_per_s")
    if "fwd_rays_per_s" in now:
        _check(now["fwd_rays_per_s"], "config3_fwd_rays_per_s")


def test_config5_throughput():
    """The 10k-prim wavefront forward/backward vs their high-water marks —
    the metric VERDICT r2/r3 tracked round over round."""
    import bench_suite
    bench_suite.enable_compile_cache()
    now = bench_suite.bench_config5(quick=False)
    bench_suite.update_hwm(
        {"config5_fwd_rays_per_s": now["fwd_rays_per_s"],
         "config5_fwd_bwd_rays_per_s": now["fwd_bwd_rays_per_s"]})
    _check(now["fwd_rays_per_s"], "config5_fwd_rays_per_s")
    _check(now["fwd_bwd_rays_per_s"], "config5_fwd_bwd_rays_per_s")


def test_headline_throughput_gate():
    """The bench.py headline metrics vs their high-water marks.

    r4 updated the headline HWM keys but never asserted them: the round's
    own forward (2027M) sat 6.2% below its 2162M mark with every gate
    green (VERDICT r4 weak #4).  This runs the real bench entry point (one
    definition of the metric) and gates all three accountings."""
    import subprocess
    import sys as _sys
    out = subprocess.run(
        [_sys.executable, os.path.join(_ROOT, "bench.py")],
        capture_output=True, text=True, timeout=1800, cwd=_ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    row = json.loads(out.stdout.strip().splitlines()[-1])
    _check(row["value"], "headline_fwd_bwd_rays_per_s")
    _check(row["forward_only_rays_s"], "headline_forward_rays_per_s")
    _check(row["value_path_segments_only"],
           "headline_path_segments_only_rays_per_s")
