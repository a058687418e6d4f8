"""CLI workflow driver (the library-native equivalent of the reference GUI's
button sequence, image_segmenter_tpu/cli.py)."""

import subprocess
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def photo(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    rgb = np.clip(np.stack([
        127 + 90 * np.sin(xx / 17) * np.cos(yy / 13),
        127 + 90 * np.cos(xx / 23),
        127 + 90 * np.sin((xx + yy) / 31),
    ], -1) + rng.normal(0, 4, (96, 128, 3)), 0, 255).astype(np.uint8)
    p = d / "in.png"
    Image.fromarray(rgb).save(p)
    return p, d


def _run_cli(args):
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "from image_segmenter_tpu.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    return subprocess.run([sys.executable, "-c", code, *map(str, args)],
                          capture_output=True, text=True, timeout=560)


def test_cli_simplify_cleanup_trim(photo):
    src, d = photo
    out = d / "out.png"
    r = _run_cli([src, out, "--colors", "6", "--algorithm", "kmeans",
                  "--cleanup", "--trim-tendrils", "2", "--stats"])
    assert r.returncode == 0, r.stderr[-2000:]
    rgba = np.asarray(Image.open(out))
    assert rgba.shape == (96, 128, 4)
    # quantized to at most the requested palette (+0 for transparent)
    assert len(np.unique(rgba[..., :3].reshape(-1, 3), axis=0)) <= 7
    assert '"total_unique_colors"' in r.stdout


def test_cli_custom_palette(photo):
    src, d = photo
    out = d / "pal.png"
    r = _run_cli([src, out, "--palette", "ff0000,00ff00,0000ff", "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    rgba = np.asarray(Image.open(out))
    got = set(map(tuple, np.unique(rgba[..., :3].reshape(-1, 3), axis=0)))
    assert got <= {(255, 0, 0), (0, 255, 0), (0, 0, 255)}


def test_cli_rejects_bad_algorithm(photo):
    src, d = photo
    r = _run_cli([src, d / "x.png", "--algorithm", "nope"])
    assert r.returncode != 0
