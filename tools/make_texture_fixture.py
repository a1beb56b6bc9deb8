"""Generate scenes/swirl.bmp — the bundled original image-texture fixture
(64x64, deterministic sinusoidal color swirl). Regenerate with:

    python tools/make_texture_fixture.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from plutracer_tpu.io.bmp import write_bmp

    n = 64
    y, x = np.mgrid[0:n, 0:n].astype(np.float64) / n
    ang = np.arctan2(y - 0.5, x - 0.5)
    r = np.hypot(x - 0.5, y - 0.5)
    img = np.stack(
        [
            0.55 + 0.45 * np.sin(9.0 * r * np.pi + 3.0 * ang),
            0.50 + 0.45 * np.sin(7.0 * x * np.pi + 2.0),
            0.50 + 0.45 * np.cos(6.0 * y * np.pi + 5.0 * r),
        ],
        axis=-1,
    )
    out = REPO / "scenes" / "swirl.bmp"
    write_bmp(str(out), np.clip(img, 0.0, 1.0).astype(np.float32))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
