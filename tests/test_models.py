"""U^2-Net family: architecture fingerprints, forward contracts, ONNX import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_segmenter_tpu.models import u2net as NETS
from image_segmenter_tpu.models import onnx_import as OIMP


def _param_count(variables):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))


@pytest.fixture(scope="module")
def u2netp_vars():
    net = NETS.U2NET(small=True)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return net, v


def test_u2netp_param_count(u2netp_vars):
    _, v = u2netp_vars
    n = _param_count(v)
    # published U2NETP size: ~1.13M parameters
    assert 1_000_000 < n < 1_200_000, n


def test_u2net_param_count():
    net = NETS.U2NET(small=False)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = _param_count(v)
    # published U2NET size: ~44.0M parameters
    assert 43_000_000 < n < 45_000_000, n


def test_forward_outputs(u2netp_vars):
    net, v = u2netp_vars
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    outs = net.apply(v, x, train=False)
    assert len(outs) == 7  # d0 + 6 side outputs
    for d in outs:
        assert d.shape == (1, 64, 64, 1)
        arr = np.asarray(d)
        assert (arr >= 0).all() and (arr <= 1).all()  # sigmoid


def test_forward_odd_size(u2netp_vars):
    net, v = u2netp_vars
    x = jnp.zeros((1, 70, 46, 3), jnp.float32)  # non-pow2, odd pooling path
    outs = net.apply(v, x, train=False)
    assert outs[0].shape == (1, 70, 46, 1)


def test_isnet_forward():
    net = NETS.ISNet()
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    outs = net.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(outs) == 6
    assert outs[0].shape == (1, 64, 64, 1)


# ---------------------------------------------------------------------------
# ONNX protobuf reader (synthetic file)
# ---------------------------------------------------------------------------

def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _len_field(field, payload):
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _varint_field(field, value):
    return _varint((field << 3) | 0) + _varint(value)


def _tensor(name, arr):
    msg = b""
    for d in arr.shape:
        msg += _varint_field(1, d)
    msg += _varint_field(2, 1)  # float32
    msg += _len_field(8, name.encode())
    msg += _len_field(9, arr.astype(np.float32).tobytes())
    return msg


def test_onnx_reader_roundtrip(tmp_path):
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)  # OIHW conv
    b = np.array([1.5, -2.5], np.float32)
    graph = (
        _len_field(5, _tensor("stage1.rebnconv1.conv_s1.weight", w))
        + _len_field(5, _tensor("stage1.rebnconv1.conv_s1.bias", b))
        + _len_field(5, _tensor("stage1.rebnconv1.bn_s1.weight", np.ones(2, np.float32)))
        + _len_field(5, _tensor("stage1.rebnconv1.bn_s1.running_mean", np.zeros(2, np.float32)))
        + _len_field(1, _len_field(4, b"Conv"))  # a node
    )
    model = _len_field(7, graph)
    p = tmp_path / "mini.onnx"
    p.write_bytes(model)

    inits, nodes = OIMP.read_onnx(str(p))
    assert set(inits) == {
        "stage1.rebnconv1.conv_s1.weight",
        "stage1.rebnconv1.conv_s1.bias",
        "stage1.rebnconv1.bn_s1.weight",
        "stage1.rebnconv1.bn_s1.running_mean",
    }
    np.testing.assert_array_equal(inits["stage1.rebnconv1.conv_s1.weight"], w)
    assert nodes == [("Conv", [], [])]

    params, stats = OIMP.map_u2net_weights(inits)
    k = params["stage1"]["rebnconv1"]["conv"]["kernel"]
    assert k.shape == (2, 2, 3, 2)  # HWIO
    np.testing.assert_array_equal(k, np.transpose(w, (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        stats["stage1"]["rebnconv1"]["bn"]["mean"], np.zeros(2))


# ---------------------------------------------------------------------------
# rembg compat contract
# ---------------------------------------------------------------------------

def test_rembg_contract():
    from processing.rembg_infer import rembg_remove_bgr_to_rgba, _ensure_rgba

    bgr = np.random.default_rng(0).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    out = rembg_remove_bgr_to_rgba(bgr, model="u2netp")
    assert out.shape == (40, 56, 4) and out.dtype == np.uint8
    # RGB preserved (cutout keeps colors), alpha binary after sharp_edges
    np.testing.assert_array_equal(out[..., :3], bgr[..., ::-1])
    assert set(np.unique(out[..., 3])) <= {0, 255}

    out2 = rembg_remove_bgr_to_rgba(bgr, model="u2netp", target_hw=(20, 28),
                                    sharp_edges=False)
    assert out2.shape == (20, 28, 4)

    with pytest.raises(ValueError):
        rembg_remove_bgr_to_rgba(np.zeros((4, 4, 4), np.uint8))
    with pytest.raises(ValueError):
        _ensure_rgba(np.zeros((4, 4), np.uint8))


def test_session_cache():
    from processing.rembg_infer import _get_session

    s1 = _get_session("u2netp")
    s2 = _get_session("u2netp")
    assert s1 is s2


def test_pil_lanczos_resize_parity(sample_photo):
    from PIL import Image
    from image_segmenter_tpu.ops import resize as rz

    for dst, method, pil in [((37, 53), rz.LANCZOS_PIL, Image.LANCZOS),
                             ((160, 224), rz.LANCZOS_PIL, Image.LANCZOS),
                             ((37, 53), rz.BILINEAR_PIL, Image.BILINEAR)]:
        dh, dw = dst
        ours = np.asarray(rz.resize_u8(jnp.asarray(sample_photo), (dh, dw), method))
        ref = np.array(Image.fromarray(sample_photo).resize((dw, dh), pil))
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 2, (dst, method, diff.max())


def test_cloth_seg_multiclass_masks():
    from image_segmenter_tpu.models import registry as REG

    sess = REG.Session("u2net_cloth_seg", half=False, seed=0)
    # constant input -> near-constant class map (random weights produce a
    # fragmented argmax on noise, and LANCZOS ringing on fragment borders
    # would make union-vs-mask comparisons meaningless)
    rgb = np.full((64, 48, 3), 128, np.uint8)
    mask = sess.predict_mask(rgb)
    assert mask.shape == (64, 48) and mask.dtype == np.uint8
    per_class = sess.predict_class_masks(rgb)
    assert per_class.shape == (3, 64, 48) and per_class.dtype == np.uint8
    union = (per_class > 127).any(axis=0)
    assert ((mask > 127) == union).mean() > 0.95


def test_cloth_seg_remove_vertical_concat():
    """rembg's cloth_seg remove() returns one cutout per garment class
    stacked vertically (3H x W); the compat surface preserves that, and
    rembg_remove_bgr_to_rgba squashes it back to the input size exactly as
    the reference's NEAREST resize does (rembg_infer.py:62-70)."""
    from image_segmenter_tpu.compat import rembg_infer as RI
    from image_segmenter_tpu.models import registry as REG

    rgb = np.full((64, 48, 3), 128, np.uint8)
    sess = REG.new_session("u2net_cloth_seg", half=False, seed=0)
    out = RI.remove(rgb, session=sess)
    assert out.shape == (3 * 64, 48, 4) and out.dtype == np.uint8
    per_class = sess.predict_class_masks(rgb)
    np.testing.assert_array_equal(out[:, :, 3].reshape(3, 64, 48), per_class)
    # each panel keeps the original RGB
    for p in range(3):
        np.testing.assert_array_equal(out[p * 64:(p + 1) * 64, :, :3], rgb)

    full = RI.rembg_remove_bgr_to_rgba(rgb[:, :, ::-1].copy(),
                                       model="u2net_cloth_seg",
                                       sharp_edges=False)
    assert full.shape == (64, 48, 4)
