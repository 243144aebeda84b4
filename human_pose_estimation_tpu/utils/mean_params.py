"""Mean SMPL parameter (Theta-bar) loading.

Capability parity with ref Trainer.load_mean_param / Predictor.load_mean_param
(src/trainer.py:201-223, src/predictor.py:88-110): builds the 85-d initial
parameter vector [scale=0.9, tx=0, ty=0 | mean pose with global rotation
zeroed and pose[0]=pi (upright) | mean shape] from the
``neutral_smpl_mean_params.h5`` asset, read directly with h5py (no deepdish).
"""
from __future__ import annotations

import os

import numpy as np

THETA_DIM = 85


def load_mean_theta(path: str) -> np.ndarray:
    """Load and assemble the (1, 85) mean parameter vector.

    Accepts the reference's .h5 asset (keys 'pose' (72,), 'shape' (10,)) or
    an .npz with the same keys. Missing file -> neutral fallback (zeros
    with the same cam/pose conventions), so inference demos work without
    the licensed asset.
    """
    mean = np.zeros((1, THETA_DIM), np.float32)
    mean[0, 0] = 0.9  # initial camera scale (ref src/trainer.py:206)
    pose = np.zeros(72, np.float32)
    shape = np.zeros(10, np.float32)
    if path and os.path.exists(path):
        if path.endswith(".npz"):
            z = np.load(path)
            pose = np.asarray(z["pose"], np.float32).reshape(-1)
            shape = np.asarray(z["shape"], np.float32).reshape(-1)
        else:
            import h5py

            with h5py.File(path, "r") as f:
                pose = np.asarray(f["pose"], np.float32).reshape(-1)
                shape = np.asarray(f["shape"], np.float32).reshape(-1)
    # Zero global rotation, then set pose[0]=pi for an upright projection
    # (ref src/trainer.py:211-217).
    pose[:3] = 0.0
    pose[0] = np.pi
    mean[0, 3:75] = pose
    mean[0, 75:] = shape
    return mean
