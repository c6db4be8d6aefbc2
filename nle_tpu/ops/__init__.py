from nle_tpu.ops.sampling import SampleGrid, sample_grid
from nle_tpu.ops.linalg import eigh_descending, safe_reciprocal, safe_rsqrt
from nle_tpu.ops.transform import transform_eigenvalues
from nle_tpu.ops.pipeline import train_filter, apply_filter

__all__ = [
    "SampleGrid",
    "sample_grid",
    "eigh_descending",
    "safe_reciprocal",
    "safe_rsqrt",
    "transform_eigenvalues",
    "train_filter",
    "apply_filter",
]
