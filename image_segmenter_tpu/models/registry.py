"""Model registry + inference sessions for the 7 reference rembg model ids.

Replaces rembg's onnxruntime session layer (reference rembg_infer.py:16-22).
A session owns Flax variables (imported from the rembg ONNX checkpoint when
present under $U2NET_HOME or ~/.u2net, deterministic random init otherwise)
and a jitted forward cached per input shape. Pre/postprocessing replicates
rembg's sessions/base.py: PIL-LANCZOS resize to the model's native size,
divide-by-max + mean/std normalization, min-max normalization of the
predicted saliency, LANCZOS upsample back.
"""

from __future__ import annotations

import os
import sys
import threading
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from image_segmenter_tpu.models import u2net as NETS
from image_segmenter_tpu.models import onnx_import as OIMP
from image_segmenter_tpu.ops import resize as RZ


@dataclass(frozen=True)
class ModelSpec:
    arch: str                 # "u2net" | "u2netp" | "isnet"
    size: Tuple[int, int]     # network input (H, W)
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    out_ch: int = 1


SPECS = {
    "u2net": ModelSpec("u2net", (320, 320), (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "u2netp": ModelSpec("u2netp", (320, 320), (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "u2net_human_seg": ModelSpec("u2net", (320, 320), (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "silueta": ModelSpec("u2net", (320, 320), (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "u2net_cloth_seg": ModelSpec("u2net", (768, 768), (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), out_ch=4),
    "isnet-general-use": ModelSpec("isnet", (1024, 1024), (0.5, 0.5, 0.5), (1.0, 1.0, 1.0)),
    "isnet-anime": ModelSpec("isnet", (1024, 1024), (0.5, 0.5, 0.5), (1.0, 1.0, 1.0)),
}


def _build(spec: ModelSpec, half: bool):
    if spec.arch == "u2net":
        return NETS.U2NET(out_ch=spec.out_ch, small=False, half=half)
    if spec.arch == "u2netp":
        return NETS.U2NET(out_ch=spec.out_ch, small=True, half=half)
    return NETS.ISNet(out_ch=spec.out_ch, half=half)


def _checkpoint_path(model: str) -> Optional[str]:
    home = os.environ.get("U2NET_HOME", os.path.join(os.path.expanduser("~"), ".u2net"))
    p = os.path.join(home, f"{model}.onnx")
    return p if os.path.isfile(p) else None


class Session:
    """One model id: variables + shape-cached jitted forward."""

    def __init__(self, model: str, half: bool = True, seed: int = 0,
                 ckpt_path: Optional[str] = None):
        if model not in SPECS:
            raise ValueError(f"unknown rembg model id: {model}")
        self.model_id = model
        self.spec = SPECS[model]
        self.half = half
        self.module = _build(self.spec, half)
        # conv/BN params are spatial-shape-independent: init with a small
        # dummy (a 1024x1024 ISNet init forward would burn minutes on CPU)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        self.variables = self.module.init(jax.random.PRNGKey(seed), dummy)
        self.weights_loaded = False
        self.load_report = None
        # explicit path (tools/verify_checkpoint) overrides U2NET_HOME discovery
        ckpt = ckpt_path if ckpt_path is not None else _checkpoint_path(model)
        if ckpt is not None:
            # Strict: a checkpoint that exists but only partially maps would
            # silently produce garbage masks — refuse instead (the reference
            # path, onnxruntime, would likewise fail loudly on a bad file).
            self.variables, self.load_report = OIMP.load_into_variables(
                dict(self.variables), ckpt, strict=True)
            self.weights_loaded = True
            # diagnostic, not output: keep stdout clean for tools that print
            # machine-readable JSON (tools/verify_checkpoint, bench.py)
            print(f"[models] {model}: {self.load_report.summary()}",
                  file=sys.stderr)

        @jax.jit
        def _fwd(variables, x):
            outs = self.module.apply(variables, x, train=False)
            return outs[0]

        self._fwd = _fwd

    def predict_mask(self, rgb: np.ndarray) -> np.ndarray:
        """rembg-style saliency mask: uint8 (H, W) at the INPUT's size.

        Multi-class heads (u2net_cloth_seg: 4 classes, class 0 = background)
        produce the union of non-background classes via argmax, matching the
        visible behavior of the reference app's single-cutout usage.
        """
        h0, w0 = rgb.shape[:2]
        nh, nw = self.spec.size
        small = RZ.resize_u8(jnp.asarray(rgb), (nh, nw), RZ.LANCZOS_PIL)
        x = self._normalize(small)
        d0 = self._fwd(self.variables, x)[0].astype(jnp.float32)
        if self.spec.out_ch > 1:
            cls = jnp.argmax(d0, axis=-1)
            mask = (cls != 0).astype(jnp.float32)
        else:
            d0 = d0[..., 0]
            # min-max normalize (rembg post)
            mi, ma = jnp.min(d0), jnp.max(d0)
            mask = (d0 - mi) / jnp.maximum(ma - mi, 1e-12)
        mask_u8_small = jnp.clip(jnp.floor(mask * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
        mask_u8 = RZ.resize_u8(mask_u8_small, (h0, w0), RZ.LANCZOS_PIL)
        return np.asarray(mask_u8)

    def predict_class_masks(self, rgb: np.ndarray) -> np.ndarray:
        """Per-class masks for multi-class heads (rembg cloth_seg returns one
        mask per garment class). (C-1, H, W) uint8, class 0 = background."""
        h0, w0 = rgb.shape[:2]
        nh, nw = self.spec.size
        small = RZ.resize_u8(jnp.asarray(rgb), (nh, nw), RZ.LANCZOS_PIL)
        x = self._normalize(small)
        d0 = self._fwd(self.variables, x)[0].astype(jnp.float32)
        cls = jnp.argmax(d0, axis=-1)
        out = []
        for c in range(1, self.spec.out_ch):
            m = (cls == c).astype(jnp.uint8) * 255
            out.append(np.asarray(RZ.resize_u8(m, (h0, w0), RZ.LANCZOS_PIL)))
        return np.stack(out)

    def _normalize(self, img_u8: jnp.ndarray) -> jnp.ndarray:
        x = img_u8.astype(jnp.float32)
        x = x / jnp.maximum(jnp.max(x), 1e-6)  # rembg divides by the image max
        mean = jnp.asarray(self.spec.mean, jnp.float32)
        std = jnp.asarray(self.spec.std, jnp.float32)
        x = (x - mean) / std
        return x[None]  # NHWC batch of 1


_sessions_lock = threading.Lock()
_sessions = {}


def new_session(model: str, **kwargs) -> Session:
    """rembg.new_session-compatible factory with per-model caching."""
    with _sessions_lock:
        sess = _sessions.get(model)
        if sess is None:
            sess = Session(model, **kwargs)
            _sessions[model] = sess
        return sess
