"""Regression guards for the backward's displacement-gradient (d_cc) branch.

``_windows_op_bwd`` computes displacement cotangents by forward-mode JVP
re-executions on a RECOMPUTED window table (ops/windows.py), relying on XLA
dead-code elimination to drop the whole branch when the caller never uses
displacement gradients. These tests pin that claim at the compiled-HLO
level (cheaper and stricter than timing): the recompute branch contains a
second table-build *convolution*, so an input-grad-only pair must compile
to strictly fewer convolutions than a pair that also takes the
displacement gradient — and to exactly as many as the forward alone.

Also pins ``ELASTICDEFORM_TPU_SKIP_DCC`` (a measurement-only escape hatch
in the production backward) as semantically inert for input gradients.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from elasticdeform_tpu.parallel import batched_deform

B, N = 2, 24


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((B, N, N, N), dtype=np.float32))
    d = jnp.asarray(rng.standard_normal((B, 3, 3, 3, 3)).astype(np.float32))
    gy = jnp.asarray(rng.random((B, N, N, N), dtype=np.float32))
    return x, d, gy


def _cost(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    return ca["flops"], ca.get("bytes accessed")


def test_dcc_branch_is_dead_code_eliminated(monkeypatch):
    """The input-grad-only pair must compile to EXACTLY the program the
    measurement-only ``ELASTICDEFORM_TPU_SKIP_DCC=1`` hatch produces (which
    physically removes the d_cc branch) — same flops, same bytes. If XLA
    ever stops DCE-ing the branch, the default cost jumps and this fails."""
    x, d, gy = _data()

    def pair_x(x, d, gy):
        y, vjp = jax.vjp(
            lambda x_: batched_deform(x_, d, order=3, mode='mirror'), x)
        (gx,) = vjp(gy)
        return y, gx

    def pair_xd(x, d, gy):
        y, vjp = jax.vjp(
            lambda x_, d_: batched_deform(x_, d_, order=3, mode='mirror'),
            x, d)
        gx, gd = vjp(gy)
        return y, gx, gd

    default_cost = _cost(pair_x, x, d, gy)

    monkeypatch.setenv("ELASTICDEFORM_TPU_SKIP_DCC", "1")
    jax.clear_caches()  # the flag is read at trace time
    try:
        skipped_cost = _cost(pair_x, x, d, gy)
    finally:
        monkeypatch.delenv("ELASTICDEFORM_TPU_SKIP_DCC")
        jax.clear_caches()

    assert default_cost == skipped_cost, (
        f"input-grad-only backward costs {default_cost} but "
        f"{skipped_cost} with the d_cc branch physically removed — XLA no "
        "longer dead-code-eliminates the unused displacement-gradient "
        "recompute (windows.py _windows_op_bwd)")

    # sanity that the assertion has teeth: actually using the displacement
    # gradient must make the compiled program strictly more expensive
    xd_flops, _ = _cost(pair_xd, x, d, gy)
    assert xd_flops > default_cost[0], (
        "pair with displacement gradient should compile to more flops than "
        "the input-grad-only pair")


def test_backward_only_vjp_drops_forward_gather():
    """Pins the claim cited at api.py `_jitted_batch_gradient` / core.py
    `deform_batch_gradient`: a backward-only program (``jax.vjp`` with the
    primal output discarded — the zero-primal route those entry points
    compile) must be strictly cheaper than the fwd+bwd pair, i.e. XLA
    dead-code-eliminates the unused forward window gather."""
    x, d, gy = _data(2)

    def bwd_only(x, d, gy):
        _, vjp = jax.vjp(
            lambda x_: batched_deform(x_, d, order=3, mode='mirror'), x)
        return vjp(gy)[0]

    def pair(x, d, gy):
        y, vjp = jax.vjp(
            lambda x_: batched_deform(x_, d, order=3, mode='mirror'), x)
        return y, vjp(gy)[0]

    bwd_flops, bwd_bytes = _cost(bwd_only, x, d, gy)
    pair_flops, pair_bytes = _cost(pair, x, d, gy)
    assert bwd_flops < pair_flops, (
        f"backward-only vjp compiles to {bwd_flops} flops but the fwd+bwd "
        f"pair to {pair_flops} — the discarded forward gather is no longer "
        "dead-code-eliminated")
    if bwd_bytes is not None and pair_bytes is not None:
        assert bwd_bytes < pair_bytes


def test_skip_dcc_env_is_semantically_inert(monkeypatch):
    x, d, gy = _data(1)

    def gx_of(x, d, gy):
        _, vjp = jax.vjp(
            lambda x_: batched_deform(x_, d, order=3, mode='mirror'), x)
        return vjp(gy)[0]

    base = np.asarray(jax.jit(gx_of)(x, d, gy))

    monkeypatch.setenv("ELASTICDEFORM_TPU_SKIP_DCC", "1")
    jax.clear_caches()  # the flag is read at trace time
    try:
        skipped = np.asarray(jax.jit(gx_of)(x, d, gy))
    finally:
        monkeypatch.delenv("ELASTICDEFORM_TPU_SKIP_DCC")
        jax.clear_caches()
    np.testing.assert_array_equal(base, skipped)
