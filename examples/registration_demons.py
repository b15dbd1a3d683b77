"""Example: diffeomorphic demons registration, end-to-end on TPU.

The classic demons loop (Thirion 1998; diffeomorphic variant Vercauteren
2007) is iterative, not gradient-descent: each step computes a force
field from the intensity difference, *smooths it with a Gaussian*
(fluid regularization), composes it into the running transform in the
velocity domain, and optionally smooths the accumulated field (elastic
regularization). Every ingredient is a library primitive here —

  * warp:            deform_field (dense per-voxel displacement)
  * forces:          gaussian_gradient_magnitude-style derivative
                     filters (gaussian_filter with order=1)
  * regularization:  gaussian_filter over the field's spatial axes
  * diffeomorphism:  integrate_velocity_field (scaling-and-squaring)
  * accumulation:    compose_displacement_fields
  * diagnostics:     jacobian_determinant_field (no folding)

— so the whole iteration jit-compiles into one TPU program. The
reference library (a single deformation op) cannot express any of this;
scipy has the filters but no differentiable/composable warp.

Run (from the repo root): python examples/registration_demons.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run without installing
import elasticdeform_tpu as ed


def main():
    rng = np.random.default_rng(3)

    # synthetic pair: a smooth image and a known diffeomorphic warp
    shape = (96, 96)
    yy, xx = np.meshgrid(*[np.linspace(-3, 3, n) for n in shape],
                         indexing='ij')
    moving = np.exp(-(yy ** 2 + xx ** 2)) + 0.4 * np.sin(2 * yy) * np.cos(xx)
    moving = jnp.asarray(moving, jnp.float32)

    true_grid = jnp.asarray(rng.standard_normal((2, 4, 4)) * 5, jnp.float32)
    true_vel = ed.displacement_field(true_grid, shape)
    true_field = ed.integrate_velocity_field(true_vel, steps=6,
                                             order=1, mode='nearest')
    fixed = ed.deform_field(moving, true_field, order=3, mode='mirror')

    sigma_fluid = 2.0      # smooth the per-step update (fluid-like)
    sigma_elastic = 0.5    # smooth the accumulated field (elastic-like)
    # (sigma_elastic = 0 reaches a lower MSE but the recovered field
    #  FOLDS — det(J) goes to -0.65; the elastic smoothing is what keeps
    #  the accumulated transform diffeomorphic.)

    @jax.jit
    def demons_step(field):
        warped = ed.deform_field(moving, field, order=3, mode='mirror')
        diff = warped - fixed
        # Thirion force: -(w - f) grad(w) / (|grad w|^2 + (w - f)^2)
        grad = jnp.stack([
            ed.gaussian_filter(warped, 1.0, order=(1, 0), mode='reflect'),
            ed.gaussian_filter(warped, 1.0, order=(0, 1), mode='reflect')])
        denom = jnp.sum(grad * grad, axis=0) + diff * diff + 1e-6
        update = -diff * grad / denom
        # fluid regularization: Gaussian-smooth the update field
        update = ed.gaussian_filter(update, sigma_fluid, axes=(1, 2))
        # diffeomorphic step: exponentiate the (small) update velocity,
        # compose into the running transform, elastic-smooth the result
        step_field = ed.integrate_velocity_field(2.0 * update, steps=4,
                                                 order=1, mode='nearest')
        field = ed.compose_displacement_fields(field, step_field,
                                               order=1, mode='nearest')
        field = ed.gaussian_filter(field, sigma_elastic, axes=(1, 2))
        loss = jnp.mean(diff * diff)
        return field, loss

    field = jnp.zeros((2, *shape), jnp.float32)
    for i in range(300):
        field, loss = demons_step(field)
        if i % 75 == 0 or i == 299:
            err = float(jnp.abs(field - true_field).mean())
            det_min = float(ed.jacobian_determinant_field(
                field)[4:-4, 4:-4].min())
            print(f"iter {i:4d}  mse {float(loss):.3e}  "
                  f"mean |field - truth| {err:.3f} voxels  "
                  f"min det(J) {det_min:.3f}")

    final_mse = float(jnp.mean(
        (ed.deform_field(moving, field, order=3, mode='mirror')
         - fixed) ** 2))
    det_min = float(ed.jacobian_determinant_field(field)[4:-4, 4:-4].min())
    print(f"final mse {final_mse:.3e}; min det(J) {det_min:.3f} "
          f"({'diffeomorphic' if det_min > 0 else 'FOLDED'})")
    assert final_mse < 1e-4, "demons registration failed to converge"
    assert det_min > 0, "recovered field folded"
    print("ok")


if __name__ == '__main__':
    main()
