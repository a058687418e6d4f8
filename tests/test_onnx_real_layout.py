"""ONNX import parity against a real-layout checkpoint + torch oracle.

No network access and no onnxruntime exist in this environment, so the
rembg-distributed checkpoints themselves are unavailable (documented in
PARITY.md). Instead these tests manufacture the same artifact: a torch
U^2-Net with rembg's exact module naming, its state dict serialized through
our own ONNX writer in torch.onnx.export layout (state-dict-named
initializers, Conv/BatchNormalization/Relu nodes in execution order), then:

- the named import path maps 100% of leaves and the Flax forward matches
  the torch forward (the oracle the reference gets from onnxruntime,
  reference rembg_infer.py:52-54);
- the graph-order positional fallback (names stripped) produces the same
  variables;
- partial/mismatched checkpoints are REFUSED loudly, never silently
  half-loaded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_segmenter_tpu.models import onnx_import as OIMP
from image_segmenter_tpu.models import onnx_writer as OW
from image_segmenter_tpu.models import u2net as NETS

torch = pytest.importorskip("torch")
from helpers.torch_u2net import U2NET as TorchU2NET  # noqa: E402


def _torch_state_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    tmodel = TorchU2NET(small=True).eval()
    # Non-trivial BN stats so folding/import mistakes can't hide.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.6, 1.5)
    state = _torch_state_np(tmodel)
    fmodel = NETS.U2NET(small=True, half=False)
    fvars = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return tmodel, state, fmodel, fvars


def test_named_import_complete_and_matches_torch(oracle, tmp_path):
    tmodel, state, fmodel, fvars = oracle
    path = str(tmp_path / "u2netp.onnx")
    OW.export_torch_state(path, state)

    loaded, report = OIMP.load_into_variables(dict(fvars), path, strict=True)
    assert report.complete and report.mode == "named"
    assert report.mapped == report.total and report.total > 200

    rng = np.random.default_rng(1)
    img = rng.random((1, 96, 96, 3), np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(loaded, jnp.asarray(img), train=False)
    for i, (t, f) in enumerate(zip(t_outs, f_outs)):
        t = t.numpy().transpose(0, 2, 3, 1)
        f = np.asarray(f)
        assert np.abs(t - f).max() < 2e-4, (i, np.abs(t - f).max())


def test_positional_fallback_matches_named(oracle, tmp_path):
    _, state, fmodel, fvars = oracle
    named = str(tmp_path / "named.onnx")
    bare = str(tmp_path / "positional.onnx")
    OW.export_torch_state(named, state)
    OW.export_torch_state(bare, state, positional=True)

    v_named, _ = OIMP.load_into_variables(dict(fvars), named, strict=True)
    v_pos, report = OIMP.load_into_variables(dict(fvars), bare, strict=True)
    assert report.complete and report.mode == "graph-order"
    for a, b in zip(jax.tree.leaves(v_named), jax.tree.leaves(v_pos)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_checkpoint_refused(oracle, tmp_path):
    _, state, _, fvars = oracle
    broken = dict(state)
    broken.pop("stage3.rebnconv2.conv_s1.weight")
    broken.pop("stage3.rebnconv2.conv_s1.bias")
    path = str(tmp_path / "partial.onnx")
    OW.export_torch_state(path, broken)
    with pytest.raises(RuntimeError, match="incomplete"):
        OIMP.load_into_variables(dict(fvars), path, strict=True)
    # non-strict: report the gap but return merged variables
    _, report = OIMP.load_into_variables(dict(fvars), path, strict=False)
    assert not report.complete
    assert any("stage3" in m for m in report.missing)


def test_shape_mismatch_refused(oracle, tmp_path):
    _, state, _, fvars = oracle
    wrong = dict(state)
    wrong["stage1.rebnconvin.conv_s1.weight"] = np.zeros((64, 4, 3, 3), np.float32)
    path = str(tmp_path / "wrong.onnx")
    OW.export_torch_state(path, wrong)
    with pytest.raises(RuntimeError, match="incomplete"):
        OIMP.load_into_variables(dict(fvars), path, strict=True)


def test_folded_bn_export_accepted(oracle, tmp_path):
    """Exports with BN constant-folded into convs carry no BN initializers;
    identity Flax BN is then numerically correct and must be accepted."""
    _, state, fmodel, fvars = oracle
    folded = {k: v for k, v in state.items()
              if ".bn_s1." not in k}
    path = str(tmp_path / "folded.onnx")
    OW.export_torch_state(path, folded)
    loaded, report = OIMP.load_into_variables(dict(fvars), path, strict=True)
    assert report.complete and report.folded_bn > 0
    bn = loaded["params"]["stage1"]["rebnconvin"]["bn"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]),
                                  np.ones_like(np.asarray(bn["scale"])))


def test_flax_roundtrip_export(oracle, tmp_path):
    """Flax -> torch-state -> ONNX -> Flax is the identity (exporter path)."""
    _, _, fmodel, fvars = oracle
    state = OW.flax_to_torch_state(fvars)
    path = str(tmp_path / "roundtrip.onnx")
    OW.export_torch_state(path, state)
    loaded, report = OIMP.load_into_variables(dict(fvars), path, strict=True)
    assert report.complete
    for a, b in zip(jax.tree.leaves(fvars), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_registry_session_with_fixture_checkpoint(oracle, tmp_path, monkeypatch):
    """Product path: Session discovers the .onnx under U2NET_HOME, strict-loads
    it, and predict_mask (rembg pre/post, reference rembg_infer.py:46-72)
    matches the torch oracle run through the same pre/post."""
    from image_segmenter_tpu.models import registry as REG
    from image_segmenter_tpu.ops import resize as RZ

    tmodel, state, _, _ = oracle
    home = tmp_path / "u2net_home"
    home.mkdir()
    OW.export_torch_state(str(home / "u2netp.onnx"), state)
    monkeypatch.setenv("U2NET_HOME", str(home))

    sess = REG.Session("u2netp", half=False)
    assert sess.weights_loaded and sess.load_report.complete

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:200, 0:240].astype(np.float32)
    rgb = np.clip(np.stack([120 + 90 * np.sin(xx / 31), 128 + 80 * np.cos(yy / 23),
                            100 + 60 * np.sin((xx + yy) / 41)], -1)
                  + rng.normal(0, 5, (200, 240, 3)), 0, 255).astype(np.uint8)
    mask = sess.predict_mask(rgb)

    # torch oracle through identical pre/post (shared resize kernel so the
    # comparison isolates checkpoint+forward parity; resize parity has its
    # own test)
    small = np.asarray(RZ.resize_u8(jnp.asarray(rgb), (320, 320), RZ.LANCZOS_PIL))
    x = small.astype(np.float32)
    x = x / max(x.max(), 1e-6)
    x = (x - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
        [0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        d0 = tmodel(torch.from_numpy(x.transpose(2, 0, 1)[None]))[0][0, 0].numpy()
    mi, ma = float(d0.min()), float(d0.max())
    m = (d0 - mi) / max(ma - mi, 1e-12)
    m8 = np.clip(np.floor(m * 255.0 + 0.5), 0, 255).astype(np.uint8)
    ref = np.asarray(RZ.resize_u8(jnp.asarray(m8), (200, 240), RZ.LANCZOS_PIL))

    diff = np.abs(mask.astype(int) - ref.astype(int))
    assert diff.max() <= 3 and diff.mean() < 0.5, (diff.max(), diff.mean())


def test_partially_renamed_export_falls_back_to_positional(oracle, tmp_path):
    """Optimizer passes commonly rename only the initializers they touch
    ('onnx::Conv_n' style). The named mapping then succeeds PARTIALLY —
    which must trigger the graph-order fallback (which ignores names and
    maps 100%), not a strict-import failure (code-review finding)."""
    _, state, fmodel, fvars = oracle
    from image_segmenter_tpu.models import onnx_writer as OW2

    inits, nodes = OW2.graph_from_torch_state(state)
    # rename ~1/3 of the conv weights the way a constant-folding pass does
    renames = {}
    for i, name in enumerate(list(inits)):
        if name.endswith(".weight") and i % 3 == 0:
            renames[name] = f"onnx::Conv_{1000 + i}"
    inits = {renames.get(k, k): v for k, v in inits.items()}
    nodes = [(op, [renames.get(x, x) for x in ins], outs)
             for op, ins, outs in nodes]
    mixed = str(tmp_path / "mixed.onnx")
    OW2.write_onnx(mixed, inits, nodes)

    named = str(tmp_path / "named_ref.onnx")
    OW.export_torch_state(named, state)
    v_named, _ = OIMP.load_into_variables(dict(fvars), named, strict=True)

    v_mixed, report = OIMP.load_into_variables(dict(fvars), mixed, strict=True)
    assert report.complete and report.mode == "graph-order", report.summary()
    for a, b in zip(jax.tree.leaves(v_named), jax.tree.leaves(v_mixed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
