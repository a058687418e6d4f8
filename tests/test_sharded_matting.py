"""Full-resolution spatially-sharded matting on the virtual device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from image_segmenter_tpu.parallel import mesh as PM
from image_segmenter_tpu.solvers.matting import solve_alpha_cf
from processing.matting_refine import refine_alpha_portrait_full_res


def _case(_rng_unused=None, h=64, w=48):
    rng = np.random.default_rng(1234)  # self-seeded (order-independent)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack([xx / w, yy / h, (xx + yy) / (w + h)], axis=-1)
    img = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    tri = np.full((h, w), 0.5)
    tri[:, :8] = 0.0
    tri[:, -8:] = 1.0
    return img, tri


def test_solver_matches_dense_under_sharding(rng):
    mesh = PM.make_mesh((1, 8))
    img, tri = _case(rng)
    sh_img = jax.device_put(jnp.asarray(img, jnp.float32),
                            NamedSharding(mesh, P("space", None, None)))
    sh_tri = jax.device_put(jnp.asarray(tri, jnp.float32),
                            NamedSharding(mesh, P("space", None)))
    with mesh:
        a_sh, ok_sh, _, _ = solve_alpha_cf(sh_img, sh_tri, max_iter=300)
    a_d, ok_d, _, _ = solve_alpha_cf(jnp.asarray(img, jnp.float32),
                                     jnp.asarray(tri, jnp.float32), max_iter=300)
    assert bool(ok_sh) and bool(ok_d)
    # CG stops at rtol=1e-5; reduction reordering under GSPMD shifts the
    # final iterate by O(1e-3). uint8 alpha quantization is 4e-3.
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_d), atol=4e-3)


def test_full_res_api_matches_small_path(rng):
    """On a <=1024 image, full-res sharded == the reference downsample path's
    input resolution, so outputs should agree closely with the unsharded
    solver-based refine."""
    h, w = 48, 64
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = [200, 50, 50]
    rgb[:, w // 2:] = [30, 30, 180]
    alpha = np.zeros((h, w), np.uint8)
    alpha[:, : w // 2] = 255

    mesh = PM.make_mesh((1, 8))
    out_sh = refine_alpha_portrait_full_res(rgb, alpha, None, mesh=mesh)
    out_d = refine_alpha_portrait_full_res(rgb, alpha, None, mesh=None)
    assert (out_sh != out_d).mean() < 0.01
    assert (out_sh[:, : w // 4] > 200).mean() > 0.9
    assert (out_sh[:, -w // 4 :] < 50).mean() > 0.9

    user = np.zeros((h, w), np.uint8)
    user[0, 0] = 2
    out_u = refine_alpha_portrait_full_res(rgb, alpha, user, mesh=mesh)
    assert out_u[0, 0] == 0
