"""human_pose_estimation_tpu — TPU-native HMR-style 3D human pose
estimation framework (JAX / XLA / Pallas / pjit).

Public surface mirrors the reference's entry points (see COMPONENTS.md
for the full map):

    from human_pose_estimation_tpu import Config, HMR, Predictor, Trainer
    from human_pose_estimation_tpu.core.smpl import load_model, smpl_forward
"""

from .config import Config, parse_config, prepare_dirs, save_config

__version__ = "0.1.0"

__all__ = [
    "Config",
    "parse_config",
    "prepare_dirs",
    "save_config",
    "HMR",
    "Predictor",
    "Trainer",
]


def __getattr__(name):
    # Lazy heavy imports so `import human_pose_estimation_tpu` stays light.
    if name == "HMR":
        from .models.hmr import HMR

        return HMR
    if name == "Predictor":
        from .infer.predictor import Predictor

        return Predictor
    if name == "Trainer":
        from .train.trainer import Trainer

        return Trainer
    raise AttributeError(name)
