"""Middlebury stereo pair loader (reference test_disparity.cpp fixture role).

Loads a rectified pair + ground-truth disparity PNG (classic Middlebury
layout: view1.png / view5.png / disp1.png with a disparity scale factor).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def load_pair(
    root: str,
    left_name: str = "view1.png",
    right_name: str = "view5.png",
    disp_name: str = "disp1.png",
    disp_scale: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (left_gray, right_gray, gt_disparity) float32 arrays.

    gt_disparity is 0 where unknown; divided by `disp_scale` (Middlebury
    third-size datasets store disp*3, full-size store disp*1).
    """
    from PIL import Image

    def gray(p):
        img = Image.open(p)
        if img.mode != "L":
            img = img.convert("L")
        return np.asarray(img, np.float32)

    left = gray(os.path.join(root, left_name))
    right = gray(os.path.join(root, right_name))
    disp = np.asarray(Image.open(os.path.join(root, disp_name)), np.float32)
    if disp.ndim == 3:
        disp = disp[..., 0]
    disp = disp / disp_scale
    return left, right, disp
