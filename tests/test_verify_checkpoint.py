"""The checkpoint-verification drill tool (tools/verify_checkpoint).

Exercised against the same torch-oracle real-layout fixture checkpoint as
tests/test_onnx_real_layout.py, so the day a real rembg .onnx appears the
drill is known-working (VERDICT r2 item 5; reference rembg_infer.py:46-72).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from helpers.torch_u2net import U2NET as TorchU2NET  # noqa: E402

from image_segmenter_tpu.models import onnx_writer as OW  # noqa: E402
from image_segmenter_tpu.tools import verify_checkpoint as VC  # noqa: E402


def _torch_state_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


@pytest.fixture(scope="module")
def fixture_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchU2NET(small=True).eval()
    state = _torch_state_np(tmodel)
    path = tmp_path_factory.mktemp("ckpt") / "u2netp.onnx"
    OW.export_torch_state(str(path), state)
    return str(path)


def test_drill_complete_checkpoint(fixture_ckpt):
    result = VC.verify(fixture_ckpt)  # model id inferred from filename
    assert result["model"] == "u2netp"
    assert result["load"]["ok"]
    assert result["load"]["mapped"] == result["load"]["total"] > 200
    # activation stats for every side output, non-degenerate values
    assert len(result["activations"]) >= 6
    for st in result["activations"]:
        assert np.isfinite([st["mean"], st["std"], st["min"], st["max"]]).all()
    # pipeline-level mask stats present and self-consistent
    m = result["mask"]
    assert 0.0 <= m["fg_frac_at_128"] <= 1.0
    assert 0.0 <= m["sharp_fg_frac"] <= 1.0
    assert 0 <= m["otsu_threshold"] <= 255


def test_drill_cli_json_roundtrip(fixture_ckpt, tmp_path, capsys):
    out = tmp_path / "report.json"
    rc = VC.main([fixture_ckpt, "--json", str(out)])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out)
    on_disk = json.loads(out.read_text())
    assert printed == on_disk
    assert printed["load"]["ok"]


def test_drill_refuses_partial_checkpoint(tmp_path):
    torch.manual_seed(0)
    tmodel = TorchU2NET(small=True).eval()
    state = _torch_state_np(tmodel)
    state.pop("stage3.rebnconv2.conv_s1.weight")
    state.pop("stage3.rebnconv2.conv_s1.bias")
    path = tmp_path / "u2netp.onnx"
    OW.export_torch_state(str(path), state)

    result = VC.verify(str(path))
    assert not result["load"]["ok"]
    assert result["load"]["mapped"] < result["load"]["total"]
    assert any("stage3" in m for m in result["load"]["missing"])
    assert "mask" not in result  # refused before running anything

    rc = VC.main([str(path)])
    assert rc == 1


def test_drill_unknown_model_id(tmp_path):
    p = tmp_path / "not_a_model.onnx"
    p.write_bytes(b"")
    with pytest.raises(SystemExit):
        VC.verify(str(p))
