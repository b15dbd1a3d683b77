"""Example: 3D U-Net-style training augmentation on TPU.

The classic elastic-deformation augmentation recipe (image + segmentation
deformed with one random grid, cubic interpolation for the image,
nearest-neighbour for the labels), batched with per-sample random grids and
streamed host -> TPU.

Run (from the repo root): python examples/augment_3d_unet.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run without installing
import elasticdeform_tpu as ed
from elasticdeform_tpu.parallel import AugmentationPipeline


def single_pair_example():
    """Reference-style API: one (image, segmentation) pair."""
    image = np.random.rand(64, 64, 64).astype(np.float32)
    seg = (np.random.rand(64, 64, 64) > 0.7).astype(np.int32)

    # one shared random grid; cubic for the image, nearest for the labels
    [image_d, seg_d] = ed.deform_random_grid(
        [image, seg], sigma=7, points=3, order=[3, 0], mode='mirror')
    print("single pair:", image_d.shape, seg_d.shape, seg_d.dtype)


def batched_jax_native_example():
    """JAX-native: batched, differentiable, jit-compiled."""
    key = jax.random.PRNGKey(0)
    batch = jnp.asarray(np.random.rand(8, 64, 64, 64).astype(np.float32))

    # per-sample random control grids
    displacement = jax.random.normal(key, (8, 3, 3, 3, 3)) * 7.0

    @jax.jit
    def augment(x, d):
        return ed.deform_batch(x, d, order=3, mode='mirror',
                               batch_impl='native')

    out = augment(batch, displacement)
    print("batched:", out.shape)

    # differentiable layer: gradients w.r.t. input AND displacement
    @jax.jit
    def loss_fn(x, d):
        y = ed.deform_batch(x, d, order=3, mode='mirror')
        return jnp.mean(y ** 2)

    gx, gd = jax.grad(loss_fn, argnums=(0, 1))(batch, displacement)
    print("grads:", gx.shape, gd.shape)


def streaming_pipeline_example():
    """Host -> TPU streaming augmentation for a training loop."""
    def batches():
        for _ in range(4):
            yield np.random.rand(8, 64, 64, 64).astype(np.float32)

    pipe = AugmentationPipeline(batches(), jax.random.PRNGKey(1),
                                sigma=7.0, points=3, order=3, mode='mirror')
    for i, augmented in enumerate(pipe):
        print(f"step {i}: {augmented.shape}")


if __name__ == "__main__":
    single_pair_example()
    batched_jax_native_example()
    streaming_pipeline_example()
