"""elasticdeform_tpu — TPU-native elastic grid deformation (JAX / XLA).

A ground-up re-design of the capabilities of ``gvtulder/elasticdeform``
(reference: /root/reference) for TPU hardware:

* the C per-voxel loop (reference deform.c:340-1043) becomes a fused,
  XLA-compiled window-gather pipeline that interpolates a coarse
  control-point displacement grid to a dense per-voxel field and resamples
  the input with order-0..5 B-splines,
* the analytic adjoint (reference deform.c gradient path + the transpose
  spline prefilter, deform.c:1049-1168) is the exact transpose of the same
  linear map — hand-written custom adjoints for the two heavy stages, a
  backward-only pipeline for the gradient entry point — so forward/backward
  are consistent to machine precision and usable as a differentiable layer
  under ``jit`` / ``vmap`` / ``shard_map``,
* the recursive IIR spline prefilter (reference deform_grid.py:154-169)
  becomes an MXU-friendly dense matrix multiply with a per-(length, order)
  precomputed filter matrix,
* batching (which the reference never had) is first-class: ``vmap`` over
  per-sample displacement grids and mesh-sharded multi-chip augmentation.

Public API (numpy-compatible, mirrors reference elasticdeform/__init__.py):
    deform_grid, deform_random_grid, deform_grid_gradient
    (+ batched: api.deform_batch, api.deform_batch_gradient;
    general resampler: api.map_coordinates, api.map_coordinates_gradient)

JAX-native functional API (traceable, differentiable):
    deform, deform_gradient, deform_batch, deform_batch_gradient,
    random_displacement, deform_random, deform_random_diffeo,
    displacement_field

General resampler family (beyond the reference — scipy.ndimage parity):
    map_coordinates (+ _batch, _gradient), deform_field (+ _batch),
    affine_transform, shift, zoom, rotate, geometric_transform,
    spline_filter, spline_filter1d; filters as MXU matmuls
    gaussian_filter(1d) / gaussian_laplace / gaussian_gradient_magnitude,
    correlate(1d) / convolve(1d), uniform_filter(1d), sobel / prewitt /
    laplace; order statistics as reduce_window / k-lane sorts
    minimum_filter(1d) / maximum_filter(1d) / rank_filter /
    median_filter / percentile_filter; grey + binary morphology
    (grey_erosion..black_tophat, binary_erosion..binary_hit_or_miss,
    generate_binary_structure / iterate_structure); field calculus
    compose_displacement_fields / invert_displacement_field /
    integrate_velocity_field (diffeomorphic scaling-and-squaring) /
    jacobian_determinant (analytic folding detection); exact
    multiresolution refine_displacement_grid; analytic grid
    regularizers bending_energy / membrane_energy

Multi-chip scale-out (elasticdeform_tpu.parallel):
    batched/sharded deformation, spatially-sharded volumes with halo
    exchange, sharded dense-field warps, streaming pipeline

Framework shims (mirror reference tf.py / torch.py):
    elasticdeform_tpu.tf, elasticdeform_tpu.torch (deform_grid,
    deform_batch, map_coordinates)
"""

from elasticdeform_tpu.api import (
    deform_grid,
    deform_random_grid,
    deform_grid_gradient,
)
from elasticdeform_tpu.core import (
    affine_transform,
    binary_closing,
    binary_dilation,
    binary_erosion,
    binary_fill_holes,
    binary_hit_or_miss,
    binary_opening,
    binary_propagation,
    black_tophat,
    compose_displacement_fields,
    deform,
    deform_batch,
    deform_batch_gradient,
    convolve,
    convolve1d,
    correlate,
    correlate1d,
    deform_field,
    deform_field_batch,
    deform_gradient,
    deform_random_diffeo,
    displacement_field,
    displacement_field_jacobian,
    fourier_ellipsoid,
    fourier_gaussian,
    fourier_shift,
    fourier_uniform,
    gaussian_filter,
    gaussian_filter1d,
    gaussian_gradient_magnitude,
    gaussian_laplace,
    generic_filter,
    generic_filter1d,
    generic_gradient_magnitude,
    generic_laplace,
    geometric_transform,
    grey_closing,
    grey_dilation,
    grey_erosion,
    grey_opening,
    integrate_velocity_field,
    invert_displacement_field,
    jacobian_determinant,
    jacobian_determinant_field,
    laplace,
    map_coordinates,
    map_coordinates_batch,
    map_coordinates_gradient,
    maximum_filter,
    maximum_filter1d,
    median_filter,
    minimum_filter,
    minimum_filter1d,
    morphological_gradient,
    morphological_laplace,
    percentile_filter,
    prewitt,
    rank_filter,
    refine_displacement_grid,
    rotate,
    shift,
    sobel,
    spline_filter,
    spline_filter1d,
    uniform_filter,
    uniform_filter1d,
    vectorized_filter,
    white_tophat,
    random_displacement,
    deform_random,
    zoom,
)
from elasticdeform_tpu.ops.morphology import (
    generate_binary_structure,
    iterate_structure,
    watershed_ift,
)
from elasticdeform_tpu.ops.distance import (
    distance_transform_bf,
    distance_transform_cdt,
    distance_transform_edt,
)
from elasticdeform_tpu.measure import (
    center_of_mass,
    extrema,
    find_objects,
    histogram,
    label,
    labeled_comprehension,
    maximum,
    maximum_position,
    mean,
    median,
    minimum,
    minimum_position,
    standard_deviation,
    sum,
    sum_labels,
    value_indices,
    variance,
)
from elasticdeform_tpu.ops.regularize import (
    bending_energy,
    membrane_energy,
)

__version__ = "0.1.0"

__all__ = [
    "affine_transform",
    "binary_closing",
    "binary_dilation",
    "binary_erosion",
    "binary_fill_holes",
    "binary_hit_or_miss",
    "binary_opening",
    "binary_propagation",
    "black_tophat",
    "deform_grid",
    "deform_random_grid",
    "deform_grid_gradient",
    "deform",
    "deform_batch",
    "deform_batch_gradient",
    "convolve",
    "convolve1d",
    "correlate",
    "correlate1d",
    "center_of_mass",
    "extrema",
    "find_objects",
    "generate_binary_structure",
    "grey_closing",
    "grey_dilation",
    "grey_erosion",
    "grey_opening",
    "histogram",
    "iterate_structure",
    "label",
    "labeled_comprehension",
    "maximum",
    "maximum_position",
    "mean",
    "median",
    "minimum",
    "minimum_position",
    "standard_deviation",
    "sum",
    "sum_labels",
    "value_indices",
    "variance",
    "deform_field",
    "deform_field_batch",
    "deform_gradient",
    "distance_transform_bf",
    "distance_transform_cdt",
    "distance_transform_edt",
    "deform_random_diffeo",
    "displacement_field",
    "displacement_field_jacobian",
    "fourier_ellipsoid",
    "fourier_gaussian",
    "fourier_shift",
    "fourier_uniform",
    "gaussian_filter",
    "gaussian_filter1d",
    "gaussian_gradient_magnitude",
    "gaussian_laplace",
    "generic_filter",
    "generic_filter1d",
    "generic_gradient_magnitude",
    "generic_laplace",
    "geometric_transform",
    "jacobian_determinant",
    "jacobian_determinant_field",
    "laplace",
    "integrate_velocity_field",
    "invert_displacement_field",
    "compose_displacement_fields",
    "refine_displacement_grid",
    "map_coordinates",
    "map_coordinates_batch",
    "map_coordinates_gradient",
    "maximum_filter",
    "maximum_filter1d",
    "median_filter",
    "minimum_filter",
    "minimum_filter1d",
    "morphological_gradient",
    "morphological_laplace",
    "percentile_filter",
    "rank_filter",
    "rotate",
    "shift",
    "sobel",
    "spline_filter",
    "spline_filter1d",
    "uniform_filter",
    "uniform_filter1d",
    "vectorized_filter",
    "watershed_ift",
    "white_tophat",
    "prewitt",
    "random_displacement",
    "deform_random",
    "zoom",
    "bending_energy",
    "membrane_energy",
    "__version__",
]
