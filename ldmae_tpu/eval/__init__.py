from .fid import (
    calculate_fid_given_paths,
    calculate_frechet_distance,
    compute_statistics_of_path,
)
from .evaluator import Evaluator, ManifoldEstimator, compute_inception_score
from .metrics import psnr, ssim
from .sampling import make_sample_fn, demo_labels
from .save_npz import save_npz

__all__ = [
    "calculate_fid_given_paths",
    "calculate_frechet_distance",
    "compute_statistics_of_path",
    "Evaluator",
    "ManifoldEstimator",
    "compute_inception_score",
    "psnr",
    "ssim",
    "make_sample_fn",
    "demo_labels",
    "save_npz",
]
