"""Real KITTI seq-05 imagery recovered from the reference's demo gif.

The reference repo ships `res/kitty-05.gif` (reference README.md:7-10): a
758x426 animation whose right-hand "Current Image" panel is the raw KITTI
odometry seq-05 grayscale camera feed (the left panel is the live map plot).
The panel occupies a FIXED crop (rows 148:254, cols 403:752 — verified
stable across all 120 frames), giving 120 frames of 349x106 real road
imagery: the only real photometric data reachable in this egress-blocked
environment.

Caveats (honest limits of the source):
  * The gif SUBSAMPLES the sequence: seq 05 has 2761 frames, the gif 120,
    so consecutive gif frames are ~23 camera frames (~2.3 s of driving)
    apart — a far wider tracking baseline than the 10 Hz feed the
    reference ran on.
  * GIF palette dithering adds high-frequency checkerboard noise (the
    Gaussian pyramid's level-0 blur suppresses most of it).
  * No ground-truth poses: this is a tracking-robustness fixture, not an
    ATE benchmark (BASELINE.md contract still requires real KITTI data).

Intrinsics: KITTI odometry seq 05 calibration (P0: fx = fy = 707.0912,
cx = 601.8873, cy = 183.1104 at 1226x370) scaled to the panel size.
"""
from __future__ import annotations

import os

import numpy as np

from ..camera import Camera

# Fixed panel crop within the 758x426 gif canvas.
PANEL_ROWS = (148, 254)
PANEL_COLS = (403, 752)
PANEL_H = PANEL_ROWS[1] - PANEL_ROWS[0]
PANEL_W = PANEL_COLS[1] - PANEL_COLS[0]

# KITTI odometry grayscale camera (sequences 04-12 calibration).
KITTI_FX = 707.0912
KITTI_FY = 707.0912
KITTI_CX = 601.8873
KITTI_CY = 183.1104
KITTI_W = 1226
KITTI_H = 370

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "tests", "fixtures", "kitti05_demo.npz",
)
REFERENCE_GIF = "/root/reference/res/kitty-05.gif"


def demo_camera() -> Camera:
    """KITTI seq-05 intrinsics scaled to the demo panel resolution."""
    sx = PANEL_W / KITTI_W
    sy = PANEL_H / KITTI_H
    return Camera(
        KITTI_FX * sx, KITTI_FY * sy, KITTI_CX * sx, KITTI_CY * sy,
        PANEL_H, PANEL_W,
    )


def extract_panel_frames(gif_path: str) -> np.ndarray:
    """Crop the "Current Image" panel out of every gif frame.

    Returns (N, PANEL_H, PANEL_W) uint8.
    """
    from PIL import Image

    im = Image.open(gif_path)
    frames = []
    for idx in range(im.n_frames):
        im.seek(idx)
        g = np.asarray(im.convert("L"))
        frames.append(g[PANEL_ROWS[0]:PANEL_ROWS[1],
                        PANEL_COLS[0]:PANEL_COLS[1]])
    return np.stack(frames)


def load_demo_frames() -> np.ndarray:
    """(N, H, W) uint8 panel frames from the checked-in fixture, falling
    back to a fresh extraction from the reference gif."""
    if os.path.exists(FIXTURE):
        with np.load(FIXTURE) as z:
            return z["frames"]
    if os.path.exists(REFERENCE_GIF):  # pragma: no cover - fixture present
        return extract_panel_frames(REFERENCE_GIF)
    raise FileNotFoundError(
        f"demo fixture missing: {FIXTURE} (and no reference gif)"
    )
