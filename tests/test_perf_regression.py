"""Performance-regression gate (SURVEY.md §4: the reference *designed* a
benchmark-with-tolerance harness at architecture-redesign-gameplan.md:1031-1058
but never implemented it; this is that harness, live).

Gated on SPT_TEST_TPU=1 — throughput assertions are only meaningful on the
real chip; the default CPU suite skips them.  The recorded floor for each
config comes from BENCH_SUITE.json committed at the repo root, derated by
the reference's own 1.1x regression bound (gameplan.md:1044: "within 10%").
"""

import json
import os

import pytest

TPU = os.environ.get("SPT_TEST_TPU") == "1"
pytestmark = pytest.mark.skipif(
    not TPU, reason="throughput gate needs the real TPU (SPT_TEST_TPU=1)")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DERATE = 1.1  # the reference's aspirational tolerance


def _recorded():
    with open(os.path.join(_ROOT, "BENCH_SUITE.json")) as f:
        return {r["config"]: r for r in json.load(f)}


def test_cornell_forward_throughput():
    """Config 2 forward rays/s must stay within 1.1x of the recorded run.

    Runs at the *recorded* spp (quick=False) so fixed dispatch overhead is
    amortized identically on both sides of the comparison; a quick-mode
    recording is skipped rather than compared apples-to-oranges.
    """
    import bench_suite
    bench_suite.enable_compile_cache()  # TPU-serialized entries only here
    rec = _recorded().get(2)
    if rec is None or "rays_per_s" not in rec:
        pytest.skip("no recorded config-2 number")
    if rec.get("quick"):
        pytest.skip("recorded config-2 row is quick-mode; re-record full")
    now = bench_suite.bench_config2(quick=False)
    assert now["spp"] == rec.get("spp", now["spp"]), \
        "recorded spp differs; re-record BENCH_SUITE.json"
    assert now["rays_per_s"] * DERATE >= rec["rays_per_s"], (
        f"forward regression: {now['rays_per_s']:.3g} < "
        f"{rec['rays_per_s']:.3g}/1.1")


def test_fwd_bwd_meets_baseline_target():
    """The headline metric must hold the BASELINE.md 500M rays/s floor,
    undiluted, at the recorded (full) spp."""
    import bench_suite
    bench_suite.enable_compile_cache()  # TPU-serialized entries only here
    now = bench_suite.bench_config3(quick=False)
    assert now["fwd_bwd_rays_per_s"] >= 500e6, (
        f"fwd+bwd {now['fwd_bwd_rays_per_s']:.3g} below the 500M target")
