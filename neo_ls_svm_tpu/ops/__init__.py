"""Op layer: feature maps, affine stack, kernels, and statistics primitives."""

from neo_ls_svm_tpu.ops.affine import AffineFeatureMap, AffineNormalizer, AffineSeparator
from neo_ls_svm_tpu.ops.orff import (
    KernelApproximatingFeatureMap,
    OrthogonalRandomFourierFeatures,
    RandomFourierFeatures,
)

__all__ = [
    "AffineFeatureMap",
    "AffineNormalizer",
    "AffineSeparator",
    "KernelApproximatingFeatureMap",
    "OrthogonalRandomFourierFeatures",
    "RandomFourierFeatures",
]
