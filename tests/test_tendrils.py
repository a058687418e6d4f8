"""Tendril trimming vs an independent Python oracle of the documented
algorithm (run-length thinness marking + scan-line majority recoloring)."""

import numpy as np
import pytest

from processing.tendril_trimming import TendrilTrimmer, trim_tendrils

NORMAL, H_THIN, V_THIN, BOTH = 10, 11, 12, 13


# ---------------------------------------------------------------------------
# oracle (pure python, written from the algorithm spec)
# ---------------------------------------------------------------------------

def _oracle_mark(rgba, thr):
    h, w = rgba.shape[:2]
    alpha = rgba[:, :, 3]
    rgb = rgba[:, :, :3]
    nt = alpha > 0
    alpha[nt] = NORMAL
    cid = (rgb[:, :, 0].astype(np.uint32) << 16) | (rgb[:, :, 1].astype(np.uint32) << 8) | rgb[:, :, 2]
    count = 0
    for y in range(h):
        for x in range(w):
            if not nt[y, x]:
                continue
            c = cid[y, x]
            l = 0
            while x - l - 1 >= 0 and alpha[y, x - l - 1] != 0 and cid[y, x - l - 1] == c:
                l += 1
            r = 0
            while x + r + 1 < w and alpha[y, x + r + 1] != 0 and cid[y, x + r + 1] == c:
                r += 1
            hthin = l + r + 1 <= thr
            u = 0
            while y - u - 1 >= 0 and alpha[y - u - 1, x] != 0 and cid[y - u - 1, x] == c:
                u += 1
            d = 0
            while y + d + 1 < h and alpha[y + d + 1, x] != 0 and cid[y + d + 1, x] == c:
                d += 1
            vthin = u + d + 1 <= thr
            if hthin and vthin:
                alpha[y, x] = BOTH; count += 1
            elif hthin:
                alpha[y, x] = H_THIN; count += 1
            elif vthin:
                alpha[y, x] = V_THIN; count += 1
    return count


def _adjacent(rgba, x, y):
    h, w = rgba.shape[:2]
    for ny, nx in [(y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)]:
        if 0 <= ny < h and 0 <= nx < w and rgba[ny, nx, 3] == NORMAL:
            return rgba[ny, nx, :3].copy()
    return None


def _oracle_process(rgba, thr):
    h, w = rgba.shape[:2]
    alpha = rgba[:, :, 3]
    rgb = rgba[:, :, :3]
    # horizontal
    changes = {}
    for y in range(h):
        x = 0
        while x < w:
            if alpha[y, x] in (H_THIN, BOTH):
                end = x
                while end + 1 < w and alpha[y, end + 1] in (H_THIN, BOTH):
                    end += 1
                counts = {}
                for px in range(x, end + 1):
                    key = tuple(rgb[y, px])
                    counts[key] = counts.get(key, 0) + 1
                maj = max(counts, key=lambda k: (counts[k], -list(counts).index(k)))
                if end - x + 1 > thr:
                    for px in range(x, end + 1):
                        changes[(y, px)] = np.array(maj, np.uint8)
                else:
                    for px in range(x, end + 1):
                        c = _adjacent(rgba, px, y)
                        if c is not None:
                            changes[(y, px)] = c
                x = end + 1
            else:
                x += 1
    for (y, x), c in changes.items():
        rgb[y, x] = c
        alpha[y, x] = NORMAL
    # vertical
    changes = {}
    for x in range(w):
        y = 0
        while y < h:
            if alpha[y, x] == V_THIN:
                end = y
                while end + 1 < h and alpha[end + 1, x] == V_THIN:
                    end += 1
                counts = {}
                for py in range(y, end + 1):
                    key = tuple(rgb[py, x])
                    counts[key] = counts.get(key, 0) + 1
                maj = max(counts, key=lambda k: (counts[k], -list(counts).index(k)))
                if end - y + 1 > thr:
                    for py in range(y, end + 1):
                        changes[(py, x)] = np.array(maj, np.uint8)
                else:
                    for py in range(y, end + 1):
                        c = _adjacent(rgba, x, py)
                        if c is not None:
                            changes[(py, x)] = c
                y = end + 1
            else:
                y += 1
    for (y, x), c in changes.items():
        rgb[y, x] = c
        alpha[y, x] = NORMAL


def _oracle_trim(rgba, thr, max_iters=30):
    result = rgba.copy()
    if not (result[:, :, 3] > 0).any():
        return result, 0
    it = 0
    while it < max_iters:
        if _oracle_mark(result, thr) == 0:
            break
        _oracle_process(result, thr)
        it += 1
    nt0 = rgba[:, :, 3] > 0
    result[nt0, 3] = 255
    return result, it


# ---------------------------------------------------------------------------

def _tendril_image(rng, h=24, w=32):
    """Blocks connected by 1-2px tendrils + transparency."""
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 3] = 0
    img[2:12, 2:12] = [200, 40, 40, 255]
    img[14:22, 18:30] = [40, 180, 60, 255]
    img[7, 12:20] = [200, 40, 40, 255]        # 1px horizontal tendril
    img[8:16, 16] = [40, 180, 60, 255]        # 1px vertical tendril
    img[18:20, 10:18] = [10, 10, 200, 255]    # 2px bar
    noise = rng.integers(0, [h, w], size=(10, 2))
    img[noise[:, 0], noise[:, 1]] = [250, 250, 20, 255]
    return img


@pytest.mark.parametrize("thr", [1, 2, 3])
def test_trim_matches_oracle(rng, thr):
    img = _tendril_image(rng)
    ours, it_ours, msg = trim_tendrils(img, thr)
    ref, it_ref = _oracle_trim(img, thr)
    np.testing.assert_array_equal(ours, ref)
    assert it_ours == it_ref
    assert f"{it_ours} iterations" in msg


def test_trim_random_images(rng):
    """Exact parity on random quantized images."""
    for trial in range(3):
        img = np.zeros((16, 20, 4), np.uint8)
        pal = np.array([[200, 40, 40], [40, 180, 60], [10, 10, 200]], np.uint8)
        pick = rng.integers(0, 3, (16, 20))
        img[..., :3] = pal[pick]
        img[..., 3] = (rng.random((16, 20)) > 0.2) * 255
        ours, it_o, _ = trim_tendrils(img, 2)
        ref, it_r = _oracle_trim(img, 2)
        np.testing.assert_array_equal(ours, ref)
        assert it_o == it_r


def test_mark_in_place(rng):
    img = _tendril_image(rng)
    t = TendrilTrimmer()
    ours = img.copy()
    n_ours = t._mark_tendrils(ours, 2)
    ref = img.copy()
    n_ref = _oracle_mark(ref, 2)
    assert n_ours == n_ref
    np.testing.assert_array_equal(ours[..., 3], ref[..., 3])


def test_iteration_and_magenta(rng):
    img = _tendril_image(rng)
    t = TendrilTrimmer()
    work = img.copy()
    n = t._trim_tendrils_in_iteration(work, 2)
    assert n > 0
    # any leftover marked pixels resolve to a neighbor color or gray
    recolored = t._apply_color_selection_to_magenta(work)
    assert recolored >= 0
    assert not np.isin(work[..., 3], [H_THIN, V_THIN, BOTH]).any()


def test_all_transparent():
    img = np.zeros((8, 8, 4), np.uint8)
    out, it, msg = trim_tendrils(img, 2)
    np.testing.assert_array_equal(out, img)
    assert it == 0 and "No non-transparent" in msg


def test_harness_smoother(rng):
    from image_segmenter_tpu.compat.harness import apply_boundary_smoothing_global

    img = _tendril_image(rng)
    out = apply_boundary_smoothing_global(img, max_iterations=25)
    assert out.shape == img.shape
    # isolated speckles inside blocks get absorbed
    img2 = img.copy()
    img2[5, 5] = [250, 250, 20, 255]  # speck inside red block
    out2 = apply_boundary_smoothing_global(img2, max_iterations=25)
    assert tuple(out2[5, 5, :3]) == (200, 40, 40)

    out3 = apply_boundary_smoothing_global(img, max_iterations=10,
                                           trim_tendrils_flag=True,
                                           tendril_threshold=2)
    assert out3.shape == img.shape
    assert (out3[img[..., 3] > 0, 3] == 255).all()
