"""Generate the README figure: a synthetic image, its elastic deformation,
and the deformed checkerboard visualizing the warp.

The reference README shows the same kind of before/after figure
(/root/reference/README.md:30 + docs/source/deformed.png); this renders an
original one from this library's own output.  Deterministic (seeded), so
re-running reproduces the committed PNG.

Usage: python tools/make_readme_figure.py  [out.png]
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

import elasticdeform_tpu as ed


def synthetic_image(n=256):
    """A smooth structured test image: rings + a bright blob, uint8-like."""
    y, x = np.mgrid[0:n, 0:n].astype(np.float64) / n - 0.5
    r = np.hypot(x, y)
    img = 0.5 + 0.5 * np.cos(22 * np.pi * r) * np.exp(-4 * r)
    img += 0.8 * np.exp(-((x - 0.18) ** 2 + (y + 0.12) ** 2) / 0.008)
    img += 0.1 * np.cos(10 * np.pi * x) * np.cos(8 * np.pi * y)
    return img.astype(np.float64)


def checkerboard(n=256, cells=12):
    idx = (np.arange(n) * cells // n)
    return ((idx[:, None] + idx[None, :]) % 2).astype(np.float64)


def main(out="docs/source/deformed.png"):
    np.random.seed(7)
    img = synthetic_image()
    board = checkerboard()
    # one shared displacement for both, like multi-input deform_grid
    displacement = np.random.randn(2, 4, 4) * 9
    img_d, board_d = ed.deform_grid([img, board], displacement, order=3,
                                    mode="mirror")

    fig, axes = plt.subplots(1, 3, figsize=(9.6, 3.4))
    for ax, (title, a) in zip(axes, [
            ("original", img),
            ("deformed (order-3, mirror)", img_d),
            ("same warp on a grid", board_d)]):
        ax.imshow(np.asarray(a), cmap="gray", interpolation="nearest")
        ax.set_title(title, fontsize=10)
        ax.set_xticks([]); ax.set_yticks([])
    fig.tight_layout(pad=0.4)
    fig.savefig(out, dpi=110)
    print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
