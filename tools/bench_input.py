"""Shared benchmark input loader (rock2.jpg resized to target megapixels)."""

import os

import numpy as np


def load_input(target_mp=1.0):
    import cv2

    path = "/root/reference/data/rock2.jpg"
    if os.path.exists(path):
        img = cv2.imread(path)
        h, w = img.shape[:2]
        scale = (target_mp * 1e6 / (h * w)) ** 0.5
        img = cv2.resize(img, (int(w * scale), int(h * scale)),
                         interpolation=cv2.INTER_CUBIC)
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (832, 1216, 3), np.uint8)
    return img
