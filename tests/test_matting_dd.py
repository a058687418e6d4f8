"""df32 matting solver vs the f64 oracle (operator parity + certified solve)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_segmenter_tpu.ops import df32 as D
from image_segmenter_tpu.solvers import matting as MT
from image_segmenter_tpu.solvers import matting_dd as MDD


def _photo(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack([127 + 90 * np.sin(xx / 11), 127 + 90 * np.cos(yy / 7),
                     127 + 80 * np.sin((xx + yy) / 13)], axis=-1)
    u8 = np.clip(base + rng.normal(0, 5, base.shape), 0, 255).astype(np.uint8)
    return u8


def _trimap(h, w):
    t = np.full((h, w), 0.5)
    t[:, : w // 4] = 0.0
    t[:, -w // 4:] = 1.0
    return t


def test_matvec_dd_matches_f64_operator():
    """The df32 exact-eps operator is the f64 operator to ~2^-45."""
    u8 = _photo()
    img64 = u8.astype(np.float64) / 255.0
    rng = np.random.default_rng(1)
    p64 = rng.random(u8.shape[:2])

    with jax.enable_x64():
        pre64 = MT._precompute(jnp.asarray(img64, jnp.float64), 1e-7, 1)
        y64 = np.asarray(MT._matvec(pre64, jnp.asarray(p64, jnp.float64), 1),
                         np.float64)

    img = MDD._split_f64(img64)
    eps = MDD._split_f64(np.float64(1e-7))
    p = MDD._split_f64(p64)
    pre = MDD._precompute_dd(img, eps)
    y = MDD._matvec_dd(pre, p)
    got = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
    scale = max(np.abs(y64).max(), 1e-30)
    err = np.abs(got - y64).max() / scale
    assert err < 1e-10, err


def test_solve_dd_matches_f64_solve_photo():
    u8 = _photo()
    img64 = u8.astype(np.float64) / 255.0
    tri = _trimap(*u8.shape[:2])

    alpha_dd, ok, it, res = MDD.solve_alpha_cf_dd(img64, tri)
    assert bool(ok), (int(it), float(res))
    assert float(res) <= 1e-7

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(), jax.default_device(cpu):
        a64, ok64, _, _ = MT.solve_alpha_cf(
            jnp.asarray(img64, jnp.float64), jnp.asarray(tri, jnp.float64),
            max_iter=10000, rtol=1e-7)
    assert bool(ok64)
    diff = np.abs(np.asarray(alpha_dd, np.float64)
                  - np.asarray(a64, np.float64)).max()
    # Two residual-certified (1e-7) answers may differ along the system's
    # near-null modes by rtol/lambda_min ~ 1e-4 — both are "the" solution.
    # The product contract is the u8 quantization: at most a hairline
    # 1-level disagreement, identical foreground masks.
    assert diff < 2e-3, diff
    dd_u8 = np.clip(np.asarray(alpha_dd, np.float64) * 255 + 0.5, 0,
                    255).astype(np.uint8)
    f64_u8 = np.clip(np.asarray(a64, np.float64) * 255 + 0.5, 0,
                     255).astype(np.uint8)
    assert np.abs(dd_u8.astype(int) - f64_u8.astype(int)).max() <= 1
    assert ((dd_u8 > 127) == (f64_u8 > 127)).mean() > 0.999


def test_solve_dd_certifies_quantized_flat():
    """The input class f32 cannot certify (rank-deficient flat windows):
    df32 must converge with a TRUE residual <= 1e-7, like the f64 rung."""
    h, w = 48, 64
    u8 = np.zeros((h, w, 3), np.uint8)
    u8[:, : w // 2] = [200, 60, 60]
    u8[:, w // 2:] = [40, 40, 180]  # exactly-quantized two-region image
    img64 = u8.astype(np.float64) / 255.0
    tri = _trimap(h, w)

    alpha_dd, ok, it, res = MDD.solve_alpha_cf_dd(img64, tri, max_iter=20000)
    assert bool(ok), (int(it), float(res))

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(), jax.default_device(cpu):
        a64, ok64, _, _ = MT.solve_alpha_cf(
            jnp.asarray(img64, jnp.float64), jnp.asarray(tri, jnp.float64),
            max_iter=20000, rtol=1e-7)
    assert bool(ok64)
    # compare as the product consumes them: u8 alphas
    dd_u8 = np.clip(np.asarray(alpha_dd, np.float64) * 255 + 0.5, 0,
                    255).astype(np.uint8)
    f64_u8 = np.clip(np.asarray(a64, np.float64) * 255 + 0.5, 0,
                     255).astype(np.uint8)
    assert np.abs(dd_u8.astype(int) - f64_u8.astype(int)).max() <= 1


def test_solve_dd_warm_start_costs_few_iterations():
    """The polish use case: warm-started at a certified f32 solution, the
    df32 solve must converge in far fewer iterations than from scratch."""
    u8 = _photo(seed=3)
    img64 = u8.astype(np.float64) / 255.0
    tri = _trimap(*u8.shape[:2])

    a32, ok32, _, _ = MT.solve_alpha_cf(
        jnp.asarray(img64, jnp.float32), jnp.asarray(tri, jnp.float32),
        max_iter=2000, rtol=1e-5)
    assert bool(ok32)

    _, ok_w, it_w, _ = MDD.solve_alpha_cf_dd(
        img64, tri, x0=np.asarray(a32, np.float32))
    _, ok_c, it_c, _ = MDD.solve_alpha_cf_dd(img64, tri)
    assert bool(ok_w) and bool(ok_c)
    assert int(it_w) < int(it_c), (int(it_w), int(it_c))


def test_estimate_alpha_cf_routes_polish_to_dd(monkeypatch):
    """With matting_dd on and a TPU-targeting computation, the polish rung
    runs device-resident df32; its output must match the host-f64 polish
    to the u8 quantization the product consumes."""
    u8 = _photo(seed=7)
    img64 = u8.astype(np.float64) / 255.0
    tri = _trimap(*u8.shape[:2])

    monkeypatch.setattr(MT, "_targets_tpu", lambda x: True)
    a_dd = MT.estimate_alpha_cf(img64, tri)
    assert MT.LAST_SOLVE_INFO.get("polish_backend") == "dd"
    assert MT.LAST_SOLVE_INFO.get("polish_converged") is True

    monkeypatch.setattr(MT, "_targets_tpu", lambda x: False)
    a_64 = MT.estimate_alpha_cf(img64, tri)
    assert MT.LAST_SOLVE_INFO.get("polish_backend") == "host_f64"

    dd_u8 = np.clip(a_dd * 255 + 0.5, 0, 255).astype(np.uint8)
    f64_u8 = np.clip(a_64 * 255 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(dd_u8.astype(int) - f64_u8.astype(int)).max() <= 1


def test_estimate_alpha_cf_routes_x64_rung_to_dd(monkeypatch):
    """Rankdef-routed input: the reference-precision rung runs in df32 on
    the device path, warm-started by the discarded f32 attempt, and matches
    the host-f64 rung. The route is FORCED via the threshold (at 48x64 the
    quantized boundary band is ~9% of the unknown band, just under the 0.1
    trigger; the signal itself is covered by test_matting_precision.py) —
    this test pins the rung's backend choice and output parity."""
    h, w = 48, 64
    u8 = np.zeros((h, w, 3), np.uint8)
    u8[:, : w // 2] = [200, 60, 60]
    u8[:, w // 2:] = [40, 40, 180]
    img64 = u8.astype(np.float64) / 255.0
    tri = _trimap(h, w)

    monkeypatch.setattr(MT, "_RANKDEF_ROUTE_FRAC", -1.0)
    monkeypatch.setattr(MT, "_targets_tpu", lambda x: True)
    a_dd = MT.estimate_alpha_cf(img64, tri)
    assert MT.LAST_SOLVE_INFO.get("dd_rung_converged") is True

    monkeypatch.setattr(MT, "_targets_tpu", lambda x: False)
    a_64 = MT.estimate_alpha_cf(img64, tri)
    assert "dd_rung_converged" not in MT.LAST_SOLVE_INFO

    dd_u8 = np.clip(a_dd * 255 + 0.5, 0, 255).astype(np.uint8)
    f64_u8 = np.clip(a_64 * 255 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(dd_u8.astype(int) - f64_u8.astype(int)).max() <= 1


def test_u8_ingest_bit_identical_to_f64_split():
    """The round-4 u8-ingest entries (raw u8 image + 256-entry host-split
    tables, gathered on device) must be BIT-identical to the f64-split
    planes path — same DF values in, same program body, so same alpha out
    — and the exactness detectors must reject non-u8/255 inputs."""
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    img64 = u8.astype(np.float64) / 255.0
    tri = _trimap(40, 56)

    # detectors
    assert np.array_equal(MDD._as_u8_exact(img64), u8)
    assert np.array_equal(MDD._as_u8_exact(u8), u8)
    assert MDD._as_u8_exact(img64 + 1e-9) is None
    assert np.array_equal(MDD._tri_codes(tri), (tri * 2).astype(np.uint8))
    assert MDD._tri_codes(tri + 0.1) is None

    # the f32 expansion table matches host f32 conversion bit-for-bit
    img_f32_dev = np.asarray(MT._expand_u8_f32(
        jnp.asarray(u8), MDD._u8_tables()[0]))
    assert np.array_equal(img_f32_dev, img64.astype(np.float32))

    # dd solve: u8 entry == planes entry, bit for bit
    a_u8, ok_u8, it_u8, _ = MDD.solve_alpha_cf_dd(img64, tri, max_iter=400)
    img = MDD._split_f64(img64)
    eps = MDD._split_f64(np.float64(1e-7))
    tri32 = jnp.asarray(tri, jnp.float32)
    a_pl, ok_pl, it_pl, _ = MDD._solve_dd_jit(
        img.hi, img.lo, eps.hi, eps.lo, tri32, tri32, 1e-7, 400)
    assert bool(ok_u8) and bool(ok_pl) and int(it_u8) == int(it_pl)
    assert np.array_equal(np.asarray(a_u8), np.asarray(a_pl))

    # pre-shipped device arrays short-circuit detection, same result
    a_pre, ok_pre, _, _ = MDD.solve_alpha_cf_dd(
        None, None, max_iter=400,
        image_u8=jnp.asarray(u8),
        tri_code=jnp.asarray((tri * 2).astype(np.uint8)))
    assert bool(ok_pre)
    assert np.array_equal(np.asarray(a_pre), np.asarray(a_u8))
