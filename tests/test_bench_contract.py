"""Guards on bench.py's artifact contract: the host-class stamp must
map the calibration bands exactly as BASELINE.md's round-12 pin table
documents them, or officials become un-adjudicable at face value."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_host_class_bands_match_baseline_table():
    b = _bench()
    # class A: the pin-era quiet band, pins apply verbatim
    assert b.host_class(0.055) == ("A", 1.0)
    assert b.host_class(0.070) == ("A", 1.0)
    # class B: the r10-r12 host-class floor, pins x 1.75
    assert b.host_class(0.0701) == ("B", 1.75)
    assert b.host_class(0.105) == ("B", 1.75)
    # class C: slow phase — no face-value column
    assert b.host_class(0.1051) == ("C", None)
    assert b.host_class(1.0) == ("C", None)


def test_host_class_b_scale_is_the_band_ceiling_ratio():
    b = _bench()
    # 1.75 == 0.105 / 0.060 — the ratio every prior adjudication used
    _, ceiling_b, scale_b = b.HOST_CLASS_BANDS[1]
    assert abs(scale_b - ceiling_b / 0.060) < 0.01
