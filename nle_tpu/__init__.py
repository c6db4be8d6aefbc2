"""nle_tpu — TPU-native nonlocal image editing (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of
lightalchemist/nonlocal-image-edit (Talebi & Milanfar, "Nonlocal Image
Editing", IEEE TIP 2014): learn a global graph filter over all pixels of an
image via Nystrom approximation + Sinkhorn-Knopp balancing + one-shot
orthogonalized eigendecomposition, then edit the image by re-weighting
eigen detail layers.

The public API mirrors the reference's `nle::NLEFilter` contract
(reference include/filter.hpp:35-54) but is functional-first: the trained
filter is a pytree `(eigvecs, eigvals)` and every stage is a jitted pure
function designed for the TPU MXU/VPU rather than a port of the Eigen code.
"""

from nle_tpu.models.filter import NLEFilter, TrainedFilter, load_filter
from nle_tpu.ops.pipeline import train_filter, apply_filter
from nle_tpu.ops.transform import transform_eigenvalues

__version__ = "0.2.0"

__all__ = [
    "NLEFilter",
    "TrainedFilter",
    "FactoredFilter",
    "load_filter",
    "train_filter",
    "apply_filter",
    "transform_eigenvalues",
]


def __getattr__(name):
    # FactoredFilter lazily: models.factored pulls the Pallas kernels in,
    # which plain enhance/denoise users never need at import time.
    if name == "FactoredFilter":
        from nle_tpu.models.factored import FactoredFilter

        return FactoredFilter
    raise AttributeError(name)
