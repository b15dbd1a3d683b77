"""Host -> TPU streaming augmentation pipeline.

The reference's TF/torch shims force device->host->device round-trips per
call (reference tf.py:33-35, torch.py:13-16). Here the data flows the other
way: raw batches stream host->device asynchronously (double/triple
buffering via a background thread + ``jax.device_put``), and the
deformation runs on-device, overlapped with the transfer of the next batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import numpy as np

from elasticdeform_tpu.parallel.sharding import batched_random_deform


def prefetch_to_device(iterator: Iterable, size: int = 2, sharding=None
                       ) -> Iterator:
    """Asynchronously ``device_put`` items from ``iterator``.

    A background thread stages up to ``size`` batches on device while the
    consumer computes — double-buffering the host->HBM copy. ``sharding``
    (e.g. a batch-axis ``NamedSharding``) places each batch directly onto a
    mesh.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item, sharding))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


class AugmentationPipeline:
    """Streaming random elastic augmentation for training input pipelines.

    Wraps a host-side batch iterator: each numpy batch ``(B, *image)`` is
    asynchronously transferred to device and deformed with per-sample random
    control grids (one jit-compiled program reused across steps).

    Example::

        pipe = AugmentationPipeline(batches, key, sigma=25, points=3,
                                    order=3, mode='mirror')
        for augmented in pipe:
            train_step(augmented)
    """

    def __init__(self, batches: Iterable[np.ndarray], key, sigma=25.0,
                 points=3, *, prefetch: int = 2, sharding=None, **kwargs):
        self._batches = batches
        self._key = key
        self._prefetch = prefetch
        self._sharding = sharding
        # forward-only augmentation: use the native batched kernels
        kwargs.setdefault("batch_impl", "native")
        self._kwargs = dict(kwargs, sigma=sigma, points=points)
        self._fn = jax.jit(
            lambda k, x: batched_random_deform(k, x, **self._kwargs))

    def __iter__(self):
        key = self._key
        for batch in prefetch_to_device(self._batches, self._prefetch,
                                        self._sharding):
            key, sub = jax.random.split(key)
            yield self._fn(sub, batch)
