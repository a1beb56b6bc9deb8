"""Opt-in render-parity gate vs the reference binary.

Skipped unless PLUTRACER_PARITY=1: it builds and runs the C++ oracle
(~minutes of CPU) and renders with this repo's renderer on whatever
backend is attached. Methodology in tools/parity.py.

    PLUTRACER_PARITY=1 python -m pytest tests/test_parity.py -q
"""

from __future__ import annotations

import os
import sys

import pytest

pytestmark = pytest.mark.parity

if not os.environ.get("PLUTRACER_PARITY"):
    pytest.skip(
        "parity gate is opt-in (set PLUTRACER_PARITY=1)", allow_module_level=True
    )

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import parity  # noqa: E402


@pytest.fixture(scope="module")
def oracle():
    return parity.build_oracle()


@pytest.mark.parametrize("scene,w,h,smp", parity.CONFIGS)
def test_render_parity(oracle, scene, w, h, smp):
    r = parity.check_scene(scene, w, h, smp)
    assert r["ok"], (
        f"{scene}: ours-vs-ref {r['dist']} exceeds noise-calibrated "
        f"bounds {r['bounds']} (ref self-noise {r['noise']})"
    )
