"""AI background removal — reference-compatible API (rembg_infer.py:1-96).

The rembg/onnxruntime stack becomes the Flax U^2-Net family (models/) with
the same public function: `rembg_remove_bgr_to_rgba(bgr, model, target_hw,
sharp_edges)`. Session caching (per-model, lock-guarded), RGBA normalization,
PIL-NEAREST size normalization, and the Otsu sharp-edges post-process all
follow the reference line-for-line in behavior.

Weights: imported from rembg's ONNX checkpoints when present (see
models/registry.py); otherwise a deterministic random init keeps the full
pipeline runnable (masks are then meaningless but shape/dtype/contract-exact).
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from image_segmenter_tpu.models import registry as REG
from image_segmenter_tpu.ops import histogram as HG
from image_segmenter_tpu.ops import morphology as M
from image_segmenter_tpu.ops import resize as RZ

_DEFAULT_MODEL = "u2net"  # rembg's default session when none is given

# Cache rembg sessions by model id (reference rembg_infer.py:12-22)
_sessions_lock = threading.Lock()
_sessions: Dict[str, object] = {}


def _get_session(model: str):
    with _sessions_lock:
        sess = _sessions.get(model)
        if sess is None:
            sess = REG.new_session(model)
            _sessions[model] = sess
        return sess


def _ensure_rgba(arr: np.ndarray) -> np.ndarray:
    """(reference :25-33)"""
    if arr.ndim != 3:
        raise ValueError("Unexpected rembg array shape")
    if arr.shape[2] == 4:
        return arr
    if arr.shape[2] == 3:
        alpha = np.where((arr[:, :, 0] | arr[:, :, 1] | arr[:, :, 2]) > 0, 255, 0).astype(np.uint8)
        return np.dstack([arr, alpha])
    raise ValueError("Unexpected rembg channel count")


def _resize_rgba(rgba: np.ndarray, target_hw: Tuple[int, int]) -> np.ndarray:
    """PIL-NEAREST resize preserving sharp edges (reference :36-43)."""
    th, tw = target_hw
    if rgba.shape[0] == th and rgba.shape[1] == tw:
        return rgba
    return np.asarray(RZ.resize_u8(jnp.asarray(rgba), (th, tw), RZ.NEAREST_PIL))


def remove(rgb: np.ndarray, session=None) -> np.ndarray:
    """rembg.remove-compatible cutout: RGBA with the predicted alpha.

    Multi-class heads (u2net_cloth_seg) reproduce rembg's actual contract:
    one cutout per garment class (upper/lower/full body), concatenated
    VERTICALLY into a 3H x W image (rembg bg.py builds get_concat_v_multi
    of the per-mask cutouts). The reference app then NEAREST-resizes that
    back to the input size (rembg_infer.py:62-70), so the squashed
    triple-panel is the reference's visible behavior — preserved here.
    """
    if session is None:
        session = _get_session(_DEFAULT_MODEL)
    if getattr(session.spec, "out_ch", 1) > 1:
        masks = session.predict_class_masks(rgb)
        return np.concatenate([np.dstack([rgb, m]) for m in masks], axis=0)
    mask = session.predict_mask(rgb)
    return np.dstack([rgb, mask])


def rembg_remove_bgr_to_rgba(
    bgr: np.ndarray,
    model: Optional[str] = None,
    target_hw: Optional[Tuple[int, int]] = None,
    sharp_edges: bool = True,
) -> np.ndarray:
    """(reference :46-72)"""
    if bgr.dtype != np.uint8 or bgr.ndim != 3 or bgr.shape[2] != 3:
        raise ValueError("bgr must be HxWx3 uint8")
    rgb = bgr[:, :, ::-1]
    if model:
        session = _get_session(model)
        out = remove(rgb, session=session)
    else:
        out = remove(rgb)
    rgba = _ensure_rgba(out)
    if target_hw is None:
        target_hw = (rgb.shape[0], rgb.shape[1])
    rgba = _resize_rgba(rgba, target_hw)
    if sharp_edges:
        rgba = _make_alpha_sharp(rgba)
    return rgba


def _make_alpha_sharp(rgba: np.ndarray) -> np.ndarray:
    """Otsu binarize + 3x3 ellipse close/open (reference :75-96)."""
    alpha = jnp.asarray(rgba[:, :, 3])
    binary = HG.otsu_binarize(alpha)
    se = M.structuring_element(M.ELLIPSE, (3, 3))
    closed = M.close_binary(binary, se)
    opened = M.open_binary(closed, se)
    result = rgba.copy()
    result[:, :, 3] = np.asarray(opened).astype(np.uint8) * 255
    return result
