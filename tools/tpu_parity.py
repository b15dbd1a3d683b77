"""On-TPU parity check against the reference C extension.

The CI conformance suite runs on CPU; the TPU compiler pipeline differs in
ways CPU cannot reproduce (bf16 matmul defaults, the excess-precision pass
that elides f32->bf16->f32 round-trips — the latter silently broke the
bf16x3 table build once). This script runs a condensed differential sweep
of the real jitted TPU path against the reference C oracle and fails loudly
if any config exceeds its tolerance.

Run on the TPU host (needs /tmp/refbuild, see .claude/skills/verify):

    python tools/tpu_parity.py
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, "/tmp/refbuild")

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import elasticdeform_tpu as ed                                # noqa: E402
import elasticdeform as edc                                   # noqa: E402


def check(name, got, want, tol):
    err = float(np.abs(np.asarray(got, np.float64)
                       - np.asarray(want, np.float64)).max())
    status = "ok  " if err <= tol else "FAIL"
    print(f"{status} {name:44s} err {err:.3e} (tol {tol:.0e})", flush=True)
    return err <= tol


def main():
    print(jax.devices(), flush=True)
    assert jax.devices()[0].platform != "cpu", "run this on the TPU"
    rng = np.random.default_rng(42)
    ok = True

    # 2D order/mode sweep (jitted via the numpy-compat API)
    X = rng.random((100, 151))
    d = rng.standard_normal((2, 3, 3)) * 20
    for order in (0, 1, 2, 3, 4, 5):
        for mode in ("mirror", "reflect", "wrap", "nearest", "constant"):
            a = edc.deform_grid(X, d, order=order, mode=mode)
            b = ed.deform_grid(X, d, order=order, mode=mode)
            if order == 0:
                frac = (np.abs(np.asarray(b) - a) > 1e-6).mean()
                status = "ok  " if frac < 0.01 else "FAIL"
                print(f"{status} 2D o0 {mode:8s} mismatch frac {frac:.4f}",
                      flush=True)
                ok &= frac < 0.01
            else:
                ok &= check(f"2D order={order} mode={mode}", b, a, 5e-5)

    # 3D crop + affine
    X3 = rng.random((64, 64, 64))
    d3 = rng.standard_normal((3, 3, 3, 3)) * 10
    crop = (slice(10, 50), slice(4, 60), slice(0, 32))
    a = edc.deform_grid(X3, d3, order=3, mode='mirror', crop=crop)
    b = ed.deform_grid(X3, d3, order=3, mode='mirror', crop=crop)
    ok &= check("3D order=3 crop", b, a, 5e-5)

    # big 3D volume (c3 shape): exercises the 512-lane auto plan with the
    # bf16x3 matmul build and the staged per-axis gather reduction
    Xb = rng.random((128, 128, 128))
    db = rng.standard_normal((3, 3, 3, 3)) * 15
    cropb = (slice(32, 96),) * 3
    a = edc.deform_grid(Xb, db, order=3, mode='mirror', crop=cropb)
    b = ed.deform_grid(Xb, db, order=3, mode='mirror', crop=cropb)
    ok &= check("3D 128^3 crop (512-lane plan)", b, a, 5e-5)

    # 2D rotate/zoom
    Xr = rng.random((80, 90))
    dr = rng.standard_normal((2, 3, 3)) * 10
    cropr = (slice(10, 70), slice(10, 80))
    a = edc.deform_grid(Xr, dr, order=3, mode='mirror', crop=cropr,
                        rotate=30, zoom=1.5)
    b = ed.deform_grid(Xr, dr, order=3, mode='mirror', crop=cropr,
                       rotate=30, zoom=1.5)
    ok &= check("2D rotate=30 zoom=1.5 crop", b, a, 5e-5)

    # multi-input mixed order + axis
    img = rng.random((3, 60, 70))
    seg = rng.random((60, 70))
    dm = rng.standard_normal((2, 3, 3)) * 15
    am = edc.deform_grid([img, seg], dm, order=[3, 0], mode='mirror',
                         axis=[(1, 2), (0, 1)])
    bm = ed.deform_grid([img, seg], dm, order=[3, 0], mode='mirror',
                        axis=[(1, 2), (0, 1)])
    ok &= check("multi-input img (order 3)", bm[0], am[0], 5e-5)
    frac = (np.abs(np.asarray(bm[1]) - am[1]) > 1e-6).mean()
    print(f"{'ok  ' if frac < 0.01 else 'FAIL'} multi-input seg (order 0) "
          f"mismatch frac {frac:.4f}", flush=True)
    ok &= frac < 0.01

    # uint8 with prefilter: bit-exact
    Xu = (rng.random((64, 80)) * 255).astype(np.uint8)
    du = rng.standard_normal((2, 3, 3)) * 10
    a = edc.deform_grid(Xu, du, order=3, mode='mirror')
    b = np.asarray(ed.deform_grid(Xu, du, order=3, mode='mirror'))
    nbad = int((a != b).sum())
    print(f"{'ok  ' if nbad == 0 else 'FAIL'} uint8 prefilter bit-exact "
          f"({nbad} mismatches)", flush=True)
    ok &= nbad == 0

    # gradient (batched jitted custom-vjp path)
    from elasticdeform_tpu.parallel import batched_deform
    B = 3
    xb = jnp.asarray(rng.random((B, 32, 32, 32), dtype=np.float32))
    db = jnp.asarray(
        rng.standard_normal((B, 3, 3, 3, 3)).astype(np.float32) * 8)
    gy = jnp.asarray(rng.random((B, 32, 32, 32), dtype=np.float32))

    @jax.jit
    def fwd_grad(x, dd, g):
        y, vjp = jax.vjp(
            lambda x_: batched_deform(x_, dd, order=3, mode='mirror'), x)
        return y, vjp(g)[0]

    y, gx = fwd_grad(xb, db, gy)
    for b_ in range(B):
        yr = edc.deform_grid(np.asarray(xb[b_], np.float64),
                             np.asarray(db[b_], np.float64),
                             order=3, mode='mirror')
        gr = edc.deform_grid_gradient(np.asarray(gy[b_], np.float64),
                                      np.asarray(db[b_], np.float64),
                                      order=3, mode='mirror',
                                      X_shape=(32, 32, 32))
        ok &= check(f"batched fwd sample {b_}", y[b_], yr, 5e-5)
        ok &= check(f"batched grad sample {b_}", gx[b_], gr, 5e-5)

    # backward-only batched adjoint (the torch/tf batched shims' route;
    # the api wrapper is the jit-cached path the shims actually call)
    from elasticdeform_tpu import api as _edapi
    gb = np.asarray(_edapi.deform_batch_gradient(
        np.asarray(gy), np.asarray(db), order=3, mode='mirror'))
    for b_ in range(B):
        gr = edc.deform_grid_gradient(np.asarray(gy[b_], np.float64),
                                      np.asarray(db[b_], np.float64),
                                      order=3, mode='mirror',
                                      X_shape=(32, 32, 32))
        ok &= check(f"batch bwd-only sample {b_}", gb[b_], gr, 5e-5)

    # displacement_field: linear-ramp identity on the jitted TPU path
    shape = (48, 61)
    d2 = rng.standard_normal((2, 3, 3)).astype(np.float32) * 4
    field = np.asarray(jax.jit(
        lambda dd: ed.displacement_field(dd, shape))(jnp.asarray(d2)))
    coords = np.stack(np.meshgrid(*[np.arange(n, dtype=np.float64)
                                    for n in shape], indexing='ij'))
    displaced = coords + field
    inside = np.ones(shape, bool)
    for h, n in enumerate(shape):
        inside &= (displaced[h] >= 0) & (displaced[h] <= n - 1)
    ramp_out = np.asarray(ed.deform(jnp.asarray(coords[0], jnp.float32),
                                    jnp.asarray(d2), order=1, mode='mirror'))
    err = float(np.abs(ramp_out[inside] - displaced[0][inside]).max())
    status = "ok  " if err <= 1e-3 else "FAIL"
    print(f"{status} {'displacement_field ramp identity':44s} "
          f"err {err:.3e} (tol 1e-03)", flush=True)
    ok &= err <= 1e-3

    # map_coordinates: the general resampler on the jitted TPU path —
    # vs scipy directly (mirror semantics unchanged in modern scipy) and
    # the deform-reproduction identity (same pipeline, same coordinates)
    import scipy.ndimage
    Xm = rng.random((48, 57)).astype(np.float32)
    cm = np.stack([rng.uniform(-4, n + 3, size=(31, 29))
                   for n in (47, 56)]).astype(np.float32)
    got = np.asarray(jax.jit(lambda x, c: ed.map_coordinates(
        x, c, order=3, mode='mirror'))(jnp.asarray(Xm), jnp.asarray(cm)))
    want = scipy.ndimage.map_coordinates(np.asarray(Xm, np.float64),
                                         np.asarray(cm, np.float64),
                                         order=3, mode='mirror')
    ok &= check("map_coordinates vs scipy (mirror)", got, want, 5e-5)
    dmc = rng.standard_normal((2, 3, 3)).astype(np.float32) * 6
    fld = np.asarray(ed.displacement_field(jnp.asarray(dmc), Xm.shape))
    idxg = np.stack(np.meshgrid(*[np.arange(n, dtype=np.float32)
                                  for n in Xm.shape], indexing='ij'))
    a_mc = np.asarray(ed.map_coordinates(jnp.asarray(Xm),
                                         jnp.asarray(idxg + fld),
                                         order=3, mode='mirror'))
    b_mc = np.asarray(ed.deform(jnp.asarray(Xm), jnp.asarray(dmc),
                                order=3, mode='mirror'))
    ok &= check("map_coordinates reproduces deform", a_mc, b_mc, 1e-5)
    # batched (native table-fold route) vs per-sample singles on-chip
    Bm = 3
    Xb_mc = rng.random((Bm, 24, 28, 20)).astype(np.float32)
    cb_mc = np.stack([
        np.stack([rng.uniform(-3, n + 2, size=(13, 15, 9))
                  for n in (23, 27, 19)])
        for _ in range(Bm)]).astype(np.float32)
    gb_mc = np.asarray(jax.jit(lambda x, c: ed.map_coordinates_batch(
        x, c, order=3, mode='reflect'))(jnp.asarray(Xb_mc),
                                        jnp.asarray(cb_mc)))
    for b_ in range(Bm):
        w_mc = np.asarray(ed.map_coordinates(jnp.asarray(Xb_mc[b_]),
                                             jnp.asarray(cb_mc[b_]),
                                             order=3, mode='reflect'))
        ok &= check(f"map_coordinates_batch sample {b_}", gb_mc[b_], w_mc,
                    1e-5)

    # scan-prefilter path on the chip (gate forced low via direct call)
    from elasticdeform_tpu.ops import prefilter as pf
    xl = jnp.asarray(rng.random((9000, 8), dtype=np.float32))
    a = np.asarray(jax.jit(lambda v: pf._apply_scan(v, 3, 0))(xl))
    w = pf.spline_filter1d_np(np.asarray(xl, np.float64), 3, 0)
    ok &= check("scan prefilter 9000-axis", a, w, 5e-4)
    # transpose via the adjoint identity <u, S v> == <S^T u, v> (no
    # 9000^2 host oracle matrix needed; S itself was just checked)
    ul = jnp.asarray(rng.random((9000, 8), dtype=np.float32))
    lhs = float(jnp.vdot(ul, jax.jit(
        lambda v: pf._apply_scan(v, 3, 0))(xl)))
    rhs = float(jnp.vdot(jax.jit(
        lambda v: pf._apply_scan_transpose(v, 3, 0))(ul), xl))
    rel = abs(lhs - rhs) / max(1.0, abs(lhs))
    status = "ok  " if rel <= 1e-5 else "FAIL"
    print(f"{status} {'scan transpose adjoint identity':44s} "
          f"err {rel:.3e} (tol 1e-05)", flush=True)
    ok &= rel <= 1e-5

    # complex inputs through the numpy API: the host-side real/imag
    # expansion must be bitwise equal to separate real-path calls (the
    # chip never executes a complex op), and the adjoint must satisfy the
    # real inner-product identity
    Xc = (rng.random((40, 44))
          + 1j * rng.random((40, 44))).astype(np.complex64)
    dc = rng.standard_normal((2, 3, 3)) * 5
    yc = np.asarray(ed.deform_grid(Xc, dc, order=3, mode='constant',
                                   cval=1 - 2j))
    yr = np.asarray(ed.deform_grid(Xc.real.copy(), dc, order=3,
                                   mode='constant', cval=1.0))
    yi = np.asarray(ed.deform_grid(Xc.imag.copy(), dc, order=3,
                                   mode='constant', cval=-2.0))
    ok &= check("complex64 split-call identity (re)", yc.real, yr, 0)
    ok &= check("complex64 split-call identity (im)", yc.imag, yi, 0)
    y0 = np.asarray(ed.deform_grid(Xc, dc, order=3, mode='constant',
                                   cval=0.0))
    dyc = (rng.random(yc.shape)
           + 1j * rng.random(yc.shape)).astype(np.complex64)
    dxc = np.asarray(ed.deform_grid_gradient(
        dyc, dc, order=3, mode='constant', cval=0.0, X_shape=Xc.shape))
    lhs_c = np.vdot(dyc, y0).real
    rhs_c = np.vdot(dxc, Xc).real
    rel_c = abs(lhs_c - rhs_c) / max(1.0, abs(lhs_c))
    status = "ok  " if rel_c <= 1e-4 else "FAIL"
    print(f"{status} {'complex adjoint identity':44s} "
          f"err {rel_c:.3e} (tol 1e-04)", flush=True)
    ok &= rel_c <= 1e-4

    # geometric_transform: the traced-mapping path must equal the same
    # coordinates through map_coordinates, on the chip
    mapping = lambda c: (c[0] * 0.9 + 1.0, c[1] * 1.05 - 2.0)
    gg = np.asarray(jax.jit(lambda x: ed.geometric_transform(
        x, mapping, order=3, mode='mirror'))(jnp.asarray(Xm)))
    iy, ix = np.meshgrid(np.arange(Xm.shape[0], dtype=np.float32),
                         np.arange(Xm.shape[1], dtype=np.float32),
                         indexing='ij')
    cexp = np.stack([iy * 0.9 + 1.0, ix * 1.05 - 2.0])
    wg = np.asarray(ed.map_coordinates(jnp.asarray(Xm), jnp.asarray(cexp),
                                       order=3, mode='mirror'))
    ok &= check("geometric_transform == map_coordinates", gg, wg, 1e-6)

    # analytic grid regularizers: chip f32 (HIGHEST-precision matmuls)
    # vs the same closed form evaluated in host float64 — catches a bf16
    # default sneaking into the quadratic-form contraction
    from elasticdeform_tpu.ops import regularize as _reg
    dreg = rng.standard_normal((3, 4, 5, 6)).astype(np.float32) * 3
    shape_reg = (40, 50, 60)
    be_tpu = float(jax.jit(lambda dd: ed.bending_energy(
        dd, shape_reg))(jnp.asarray(dreg)))
    me_tpu = float(jax.jit(lambda dd: ed.membrane_energy(
        dd, shape_reg))(jnp.asarray(dreg)))

    def _energy_host(terms):
        c = np.asarray(dreg, np.float64)
        for ax in range(1, c.ndim):
            c = scipy.ndimage.spline_filter1d(c, order=3, axis=ax,
                                              mode='mirror')
        spac = [(shape_reg[k] - 1) / (dreg.shape[1 + k] - 1)
                for k in range(3)]
        vol = float(np.prod(spac))
        total = 0.0
        for orders in terms:
            mats = [np.asarray(_reg._gram_matrices(dreg.shape[1 + k])
                               [orders[k]]) for k in range(3)]
            scale = vol / float(np.prod(
                [spac[k] ** (2 * orders[k]) for k in range(3)]))
            for h in range(3):
                t = c[h]
                for A in mats:
                    t = np.tensordot(t, A, axes=[[0], [0]])
                total += scale * float(np.sum(c[h] * t))
        return total

    be_host = _energy_host(_reg._terms_bending(3))
    me_host = _energy_host(_reg._terms_membrane(3))

    # analytic Jacobian determinant: chip f32 (derivative interpolation
    # matrices, HIGHEST matmuls) vs the same construction in host f64
    from elasticdeform_tpu.ops.displacement import displacement_matrix
    djac = rng.standard_normal((2, 4, 5)).astype(np.float32) * 4
    shape_j = (40, 44)
    det_tpu = np.asarray(jax.jit(lambda dd: ed.jacobian_determinant(
        dd, shape_j))(jnp.asarray(djac)))
    Jh = np.zeros((2, 2) + shape_j)
    for k in range(2):
        for h in range(2):
            out = np.asarray(djac[h], np.float64)
            for ax in range(2):
                W = displacement_matrix(shape_j[ax], out.shape[ax],
                                        shape_j[ax], 0, True,
                                        derivative=1 if ax == k else 0)
                out = np.moveaxis(
                    np.tensordot(W, out, axes=[[1], [ax]]), 0, ax)
            Jh[h, k] = out
    M = np.moveaxis(Jh, (0, 1), (-2, -1)) + np.eye(2)
    det_host = (M[..., 0, 0] * M[..., 1, 1]
                - M[..., 0, 1] * M[..., 1, 0])
    ok &= check("jacobian_determinant f32 vs host f64", det_tpu, det_host,
                1e-4)
    for name, tpu_v, host_v in (("bending_energy f32 vs host f64",
                                 be_tpu, be_host),
                                ("membrane_energy f32 vs host f64",
                                 me_tpu, me_host)):
        rel = abs(tpu_v - host_v) / max(1e-12, abs(host_v))
        status = "ok  " if rel <= 1e-4 else "FAIL"
        print(f"{status} {name:44s} err {rel:.3e} (tol 1e-04)", flush=True)
        ok &= rel <= 1e-4

    # exact multiresolution refinement: the refined grid must apply the
    # IDENTICAL deformation on chip (both calls f32, whole pipeline)
    Xr = rng.random((96, 112)).astype(np.float32)
    dr = (rng.standard_normal((2, 4, 5)) * 6).astype(np.float32)
    y_c = np.asarray(ed.deform(jnp.asarray(Xr), jnp.asarray(dr),
                               order=3, mode='mirror'))
    y_r = np.asarray(ed.deform(
        jnp.asarray(Xr),
        ed.refine_displacement_grid(jnp.asarray(dr), factor=2),
        order=3, mode='mirror'))
    ok &= check("refine_displacement_grid deform identity", y_r, y_c, 5e-5)

    # velocity-field exponential: chip f32 scaling-and-squaring vs an
    # independent scipy f64 host oracle of the same recursion
    import scipy.ndimage as ndi
    gv = (rng.standard_normal((2, 4, 4)) * 3).astype(np.float32)
    shape_v = (48, 52)
    v_chip = ed.displacement_field(jnp.asarray(gv), shape_v)
    u_chip = np.asarray(jax.jit(lambda vv: ed.integrate_velocity_field(
        vv, steps=6, order=3, mode='mirror'))(v_chip))
    v_host = np.asarray(v_chip, np.float64)
    idg = np.indices(shape_v, dtype=np.float64)
    u_host = v_host / 2.0 ** 6
    for _ in range(6):
        coords = idg + u_host
        u_host = u_host + np.stack([
            ndi.map_coordinates(u_host[h], coords, order=3, mode='mirror')
            for h in range(2)])
    inner = (slice(None), slice(4, -4), slice(4, -4))
    ok &= check("integrate_velocity_field f32 vs scipy f64",
                u_chip[inner], u_host[inner], 5e-4)

    # Gaussian filter family: chip f32 HIGHEST matmuls vs scipy f64
    xg = rng.random((64, 96)).astype(np.float32)
    for mode in ("reflect", "mirror", "nearest", "wrap", "constant"):
        got = np.asarray(jax.jit(lambda a: ed.gaussian_filter1d(
            a, 2.3, axis=1, mode=mode, cval=0.7))(jnp.asarray(xg)))
        want = ndi.gaussian_filter1d(np.asarray(xg, np.float64), 2.3,
                                     axis=1, mode=mode, cval=0.7)
        ok &= check(f"gaussian_filter1d {mode} f32 vs scipy f64", got,
                    want, 2e-5)
    got = np.asarray(jax.jit(lambda a: ed.gaussian_filter(
        a, (1.5, 2.5), order=(0, 1)))(jnp.asarray(xg)))
    want = ndi.gaussian_filter(np.asarray(xg, np.float64), (1.5, 2.5),
                               order=(0, 1))
    ok &= check("gaussian_filter order(0,1) f32 vs scipy", got, want, 2e-5)
    got = np.asarray(jax.jit(lambda a: ed.gaussian_laplace(
        a, 1.6))(jnp.asarray(xg)))
    want = ndi.gaussian_laplace(np.asarray(xg, np.float64), 1.6)
    ok &= check("gaussian_laplace f32 vs scipy f64", got, want, 2e-5)
    got = np.asarray(jax.jit(lambda a: ed.gaussian_gradient_magnitude(
        a, 1.2))(jnp.asarray(xg)))
    want = ndi.gaussian_gradient_magnitude(np.asarray(xg, np.float64), 1.2)
    ok &= check("gaussian_gradient_magnitude f32 vs scipy", got, want, 2e-5)
    taps = [0.5, -1.0, 2.0, 0.25]
    got = np.asarray(jax.jit(lambda a: ed.correlate1d(
        a, taps, axis=1, mode='nearest', origin=1))(jnp.asarray(xg)))
    want = ndi.correlate1d(np.asarray(xg, np.float64), taps, axis=1,
                           mode='nearest', origin=1)
    ok &= check("correlate1d even-taps origin f32 vs scipy", got, want,
                2e-6)
    got = np.asarray(jax.jit(lambda a: ed.uniform_filter(
        a, (3, 5)))(jnp.asarray(xg)))
    want = ndi.uniform_filter(np.asarray(xg, np.float64), (3, 5))
    ok &= check("uniform_filter f32 vs scipy", got, want, 2e-6)
    got = np.asarray(jax.jit(lambda a: ed.sobel(a, 0))(jnp.asarray(xg)))
    want = ndi.sobel(np.asarray(xg, np.float64), 0)
    ok &= check("sobel f32 vs scipy", got, want, 2e-5)
    got = np.asarray(jax.jit(lambda a: ed.laplace(a))(jnp.asarray(xg)))
    want = ndi.laplace(np.asarray(xg, np.float64))
    ok &= check("laplace f32 vs scipy", got, want, 2e-5)

    # order-statistic / morphology / distance tier on chip: these are
    # comparison-and-select ops (no accumulation; median runs the
    # pruned min/max selection network), so chip results must be EXACT
    # vs scipy; correlate (banded-matmul path) and EDT (min-plus adds)
    # are f32-tolerance
    got = np.asarray(jax.jit(lambda a: ed.median_filter(
        a, 3))(jnp.asarray(xg)))
    want = ndi.median_filter(xg, 3)
    ok &= check("median_filter chip exact vs scipy", got, want, 0.0)
    got = np.asarray(jax.jit(lambda a: ed.grey_dilation(
        a, size=(3, 4)))(jnp.asarray(xg)))
    want = ndi.grey_dilation(xg, size=(3, 4))
    ok &= check("grey_dilation chip exact vs scipy", got, want, 0.0)
    wk = rng.standard_normal((3, 3))
    got = np.asarray(jax.jit(lambda a: ed.correlate(
        a, wk, mode='wrap'))(jnp.asarray(xg)))
    want = ndi.correlate(np.asarray(xg, np.float64), wk, mode='wrap')
    ok &= check("correlate ND conv f32 vs scipy f64", got, want, 2e-5)
    blob = (ndi.gaussian_filter(rng.standard_normal((48, 52)), 2.0)
            > 0.05)
    got = np.asarray(jax.jit(lambda a: ed.binary_erosion(
        a, iterations=2))(jnp.asarray(blob)))
    want = ndi.binary_erosion(blob, iterations=2)
    ok &= check("binary_erosion x2 chip exact", got.astype(np.float64),
                want.astype(np.float64), 0.0)
    mask = blob.copy(); mask.flat[0] = False
    got = np.asarray(jax.jit(lambda a: ed.distance_transform_edt(
        a))(jnp.asarray(mask)))
    want = ndi.distance_transform_edt(mask)
    ok &= check("distance_transform_edt f32 vs scipy f64", got, want,
                1e-4)
    got = np.asarray(jax.jit(lambda a: ed.distance_transform_cdt(
        a, 'taxicab'))(jnp.asarray(mask))).astype(np.float64)
    want = ndi.distance_transform_cdt(mask, 'taxicab').astype(np.float64)
    ok &= check("distance_transform_cdt chip exact", got, want, 0.0)
    lg, ng = ed.label(blob)
    lw, nw = ndi.label(blob)
    ok &= check("label count chip vs scipy",
                np.asarray([float(ng)]), np.asarray([float(nw)]), 0.0)
    ok &= check("label values chip vs scipy", lg.astype(np.float64),
                lw.astype(np.float64), 0.0)
    sg = np.asarray(ed.sum_labels(xg[:48, :48], lw[:48, :48],
                                  np.arange(1, nw + 1)))
    sw = ndi.sum_labels(np.asarray(xg[:48, :48], np.float64),
                        lw[:48, :48], np.arange(1, nw + 1))
    ok &= check("sum_labels segment_sum f32 vs scipy f64", sg, sw, 2e-4)

    # keyed diffeomorphic augmentation: jitted chip call == the explicit
    # grid -> field -> exponential -> warp composition on chip
    key = jax.random.PRNGKey(7)
    Xd = jnp.asarray(rng.random((48, 52)).astype(np.float32))
    got = np.asarray(jax.jit(lambda k: ed.deform_random_diffeo(
        k, Xd, sigma=4.0, points=4, steps=6, mode='mirror'))(key))
    gd = ed.random_displacement(key, (4, 4), 4.0)
    vd = ed.displacement_field(gd, (48, 52))
    ud = ed.integrate_velocity_field(vd, steps=6, order=1, mode='nearest')
    want = np.asarray(ed.deform_field(Xd, ud, order=3, mode='mirror'))
    ok &= check("deform_random_diffeo == manual pipeline", got, want, 3e-5)

    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


def fuzz(n, seed=0):
    """Randomized differential sweep vs the reference C extension.

    Samples random (ndim, shape, points, sigma, order, mode, prefilter,
    crop, channel-axis, rotate/zoom) configurations; checks the forward
    for every config and the hand-written gradient path for ~a third.
    Order-0 outputs compare by mismatch fraction (f32 rounding near
    half-integer coordinates legitimately flips single voxels).
    """
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(seed)
    ok = True
    for i in range(n):
        ndim = int(rng.integers(2, 4))
        shape = tuple(int(rng.integers(20, 70)) for _ in range(ndim))
        points = int(rng.integers(3, 6))
        sigma = float(rng.uniform(2, 15))
        order = int(rng.integers(0, 6))
        mode = ["mirror", "reflect", "wrap", "nearest",
                "constant"][int(rng.integers(5))]
        prefilter = bool(rng.integers(2))
        cval = float(rng.uniform(-1, 1)) if mode == "constant" else 0.0
        kw = dict(order=order, mode=mode, cval=cval, prefilter=prefilter)
        if rng.random() < 0.5:
            kw["crop"] = tuple(
                slice(int(a), int(a) + int(rng.integers(8, s - a)))
                for s, a in ((s, rng.integers(0, s - 10)) for s in shape))
        if ndim == 2 and rng.random() < 0.25:
            kw["rotate"] = float(rng.uniform(-45, 45))
            kw["zoom"] = float(rng.uniform(0.7, 1.5))
        chan = ndim == 2 and rng.random() < 0.25
        full = ((2, *shape) if chan else shape)
        X = rng.random(full)
        if chan:
            kw["axis"] = (1, 2)
        d = rng.standard_normal((ndim, *([points] * ndim))) * sigma
        name = (f"fuzz{i:03d} {ndim}D o{order} {mode[:4]} pf{int(prefilter)}"
                f" {'crop' if 'crop' in kw else '    '}"
                f"{' rz' if 'rotate' in kw else ''}{' ch' if chan else ''}")
        as_complex = order > 0 and rng.random() < 0.2
        if as_complex:
            # differential for the complex expansion: the reference C is
            # real-only, so the oracle is the reference on each part with
            # the matching cval component
            Xi = rng.random(full)
            cvi = float(rng.uniform(-1, 1)) if mode == "constant" else 0.0
            Xc = (X + 1j * Xi).astype(np.complex64)
            a = (edc.deform_grid(X, d, **kw)
                 + 1j * edc.deform_grid(Xi, d, **{**kw, "cval": cvi}))
            b = ed.deform_grid(Xc, d,
                               **{**kw, "cval": complex(kw["cval"], cvi)})
            ok &= check(name + " cx", b, a, 5e-5)
        else:
            a = edc.deform_grid(X, d, **kw)
            b = ed.deform_grid(X, d, **kw)
            if order == 0:
                frac = (np.abs(np.asarray(b) - a) > 1e-6).mean()
                good = frac < 0.01
                print(f"{'ok  ' if good else 'FAIL'} {name} frac {frac:.4f}",
                      flush=True)
                ok &= good
            else:
                ok &= check(name, b, a, 5e-5)
        if not chan and rng.random() < 0.15:
            # map_coordinates differential vs scipy (modes whose
            # semantics are unchanged in modern scipy)
            import scipy.ndimage as _ndi
            m2 = ["mirror", "wrap", "constant"][int(rng.integers(3))]
            o2 = int(rng.integers(1, 6))
            out_s = tuple(int(rng.integers(6, 20)) for _ in range(ndim))
            X2 = rng.random(shape)
            cmc = np.stack([rng.uniform(-3, s + 2, size=out_s)
                            for s in shape])
            amc = _ndi.map_coordinates(X2, cmc, order=o2, mode=m2,
                                       cval=-0.5)
            bmc = ed.map_coordinates(jnp.asarray(X2, jnp.float32),
                                     jnp.asarray(cmc, jnp.float32),
                                     order=o2, mode=m2, cval=-0.5)
            ok &= check(f"fuzz{i:03d} mapc {ndim}D o{o2} {m2[:4]}",
                        bmc, amc, 5e-5)
        if order > 0 and "rotate" not in kw and rng.random() < 0.35:
            out_shape = np.asarray(a).shape
            gy = rng.random(out_shape)
            gkw = {k: v for k, v in kw.items() if k not in ("rotate", "zoom")}
            ga = edc.deform_grid_gradient(gy, d, X_shape=full, **gkw)
            gb = ed.deform_grid_gradient(gy, d, X_shape=full, **gkw)
            # the transpose prefilter's per-axis gain (~6/24 at orders
            # 3/4-5) amplifies f32 rounding; a 3D order-4 pf grad
            # measures 1.3e-4 even on CPU f32 while f64 agrees at 3e-13
            gtol = 5e-5 if order <= 3 or not prefilter else 5e-4
            ok &= check(name + " grad", gb, ga, gtol)
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if "--fuzz" in sys.argv:
        n = int(sys.argv[sys.argv.index("--fuzz") + 1])
        sys.exit(fuzz(n))
    sys.exit(main())
