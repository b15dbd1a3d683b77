"""Batching and multi-chip scale-out for augmentation pipelines."""

from elasticdeform_tpu.parallel.sharding import (
    batched_deform,
    batched_random_deform,
    sharded_deform,
    make_augmentation_mesh,
)
from elasticdeform_tpu.parallel.spatial import (
    sharded_deform_spatial,
    sharded_deform_batched_spatial,
    sharded_deform_field_spatial,
    sharded_deform_field_batched_spatial,
    sharded_deform_spatial_nd,
    sharded_deform_batched_spatial_nd,
    validate_max_displacement,
)
from elasticdeform_tpu.parallel.pipeline import AugmentationPipeline

__all__ = [
    "batched_deform",
    "batched_random_deform",
    "sharded_deform",
    "sharded_deform_spatial",
    "sharded_deform_batched_spatial",
    "sharded_deform_field_spatial",
    "sharded_deform_field_batched_spatial",
    "sharded_deform_spatial_nd",
    "sharded_deform_batched_spatial_nd",
    "validate_max_displacement",
    "make_augmentation_mesh",
    "AugmentationPipeline",
]
