"""Profiling utilities + training checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from image_segmenter_tpu.utils import profiling as P


def test_mask_iou():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    assert P.mask_iou(a, b) == 1.0
    a[:5] = True
    b[2:7] = True
    assert abs(P.mask_iou(a, b) - 3 / 7) < 1e-9


def test_trace_and_log(capsys):
    with P.trace_stage("unit-stage"):
        _ = jnp.ones((8, 8)).sum()
    rep = P.stage_report()
    assert "unit-stage" in rep and rep["unit-stage"] >= 0
    rec = P.log_metric("test_metric", 12.3456, "MP/s", {"vs_baseline": 0.2})
    assert rec["value"] == 12.3456 and rec["unit"] == "MP/s"
    assert P.mp_per_sec(2_000_000, 0.5) == 4.0


def test_checkpoint_roundtrip(tmp_path):
    from image_segmenter_tpu.models.u2net import U2NET
    from image_segmenter_tpu.pipeline import train as PT

    module = U2NET(small=True)
    tx, state = PT.create_train_state(module, jax.random.PRNGKey(0), (32, 32))
    step = jax.jit(PT.make_train_step(module, tx))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    masks = jnp.asarray((rng.random((1, 32, 32)) > 0.5), jnp.float32)
    state, _ = step(state, imgs, masks)

    path = str(tmp_path / "ckpt")
    PT.save_checkpoint(path, state)
    _, template = PT.create_train_state(module, jax.random.PRNGKey(1), (32, 32))
    restored = PT.restore_checkpoint(path, template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training
    state2, loss = step(restored, imgs, masks)
    assert np.isfinite(float(loss)) and int(state2.step) == 2
