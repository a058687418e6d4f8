"""Flax model zoo: the U^2-Net family behind the reference's rembg models.

The 7 model ids the reference UI exposes (bg_tools_panel.py:142-149) map to
three architectures:

  u2net / u2net_human_seg / silueta  -> U2NET (full, ~44M params)
  u2net_cloth_seg                    -> U2NET with 4-class output
  u2netp                             -> U2NETP (lightweight, ~1.1M params)
  isnet-general-use / isnet-anime    -> ISNet (DIS)

Weights import from the rembg-distributed ONNX checkpoints when present
(ops-free protobuf reader in onnx_import.py — onnxruntime is not a
dependency); otherwise deterministic random init so shape/compile/throughput
paths stay exercisable offline.
"""
