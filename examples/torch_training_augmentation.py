"""Example: elastic-deformation augmentation inside a PyTorch training loop.

The model trains in PyTorch (CPU/GPU); the augmentation runs on the JAX
default device (TPU) through the differentiable shim — one device
round-trip per step via the *batched* kernels, not a per-sample loop.
Gradients flow through the deformation back to the input pipeline when
needed (e.g. adversarial augmentation); for plain augmentation wrap the
call in ``torch.no_grad()``.

Run (from the repo root): python examples/torch_training_augmentation.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run without installing

import torch
import elasticdeform_tpu.torch as edt


def main():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, H, W = 8, 64, 64

    model = torch.nn.Sequential(
        torch.nn.Conv2d(1, 8, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(8, 1, 3, padding=1),
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    for step in range(3):
        images = torch.rand(B, H, W, dtype=torch.float64)
        targets = torch.rand(B, H, W, dtype=torch.float64)

        # per-sample random control grids, deformed in ONE batched call
        # on the JAX device; same grid would also deform a segmentation
        # (pass [images, segs] with order=[3, 0])
        grids = torch.as_tensor(
            rng.standard_normal((B, 2, 3, 3)) * 6)
        with torch.no_grad():
            aug = edt.deform_batch(images, grids, order=3, mode='mirror')

        pred = model(aug.float().unsqueeze(1)).squeeze(1)
        loss = torch.nn.functional.mse_loss(pred, targets.float())
        opt.zero_grad()
        loss.backward()
        opt.step()
        print(f"step {step}: loss {loss.item():.4f}")

    # differentiable use: gradients w.r.t. the *input image* through the
    # deformation (the shim's backward is the exact analytic adjoint)
    x = torch.rand(2, 32, 32, dtype=torch.float64, requires_grad=True)
    g = torch.as_tensor(rng.standard_normal((2, 2, 3, 3)) * 4)
    y = edt.deform_batch(x, g, order=3, mode='mirror')
    y.sum().backward()
    print("input-gradient norm:", float(x.grad.norm()))


if __name__ == "__main__":
    main()
