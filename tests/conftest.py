"""Test configuration: force a virtual 8-device CPU mesh before JAX imports.

Per SURVEY.md §4, the reference ships no automated tests; this suite is the
framework's own correctness oracle — CPU golden implementations (cv2 / PIL /
sklearn / scipy where available, pure numpy otherwise) compared against the
TPU-native JAX paths. Multi-chip sharding tests run on the virtual CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin (if present) overrides the JAX_PLATFORMS env var via
# jax.config at import time; force it back so tests run on the virtual
# 8-device CPU mesh regardless of the tunnel backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def sample_rgba(rng):
    """A quantized-looking RGBA test image: a few flat color regions + noise."""
    h, w = 96, 128
    img = np.zeros((h, w, 4), dtype=np.uint8)
    palette = np.array(
        [[200, 40, 40], [40, 180, 60], [50, 60, 210], [230, 220, 90], [20, 20, 20]],
        dtype=np.uint8,
    )
    yy, xx = np.mgrid[0:h, 0:w]
    region = (yy // 24 + xx // 32) % len(palette)
    img[..., :3] = palette[region]
    img[..., 3] = 255
    # transparent hole + a speckle of small regions
    img[10:20, 10:25, 3] = 0
    pts = rng.integers(0, [h, w], size=(40, 2))
    img[pts[:, 0], pts[:, 1], :3] = rng.integers(0, 256, size=(40, 3))
    return img


@pytest.fixture(scope="session")
def sample_photo(rng):
    """A smooth, photo-like RGB image (gradients + blobs)."""
    h, w = 80, 112
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 127 + 100 * np.sin(xx / 19.0) * np.cos(yy / 13.0)
    g = 127 + 100 * np.cos(xx / 23.0)
    b = 127 + 100 * np.sin((xx + yy) / 31.0)
    img = np.stack([r, g, b], axis=-1)
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)
