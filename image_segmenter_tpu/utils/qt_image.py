"""Qt <-> numpy bridge (reference app/utils/qt_image.py:1-44).

The QImage converters require PySide6 (present on desktop deployments of the
UI, absent in headless TPU pods); `composite_foreground_over_transparent` is
pure numpy and always available.
"""

from __future__ import annotations



import numpy as np


def qimage_to_numpy_bgr(image) -> np.ndarray:
    """(reference qt_image.py:9-22)"""
    from PySide6.QtGui import QImage  # noqa: PLC0415

    if image.format() != QImage.Format.Format_RGBA8888:
        img = image.convertToFormat(QImage.Format.Format_RGBA8888)
    else:
        img = image
    w = img.width()
    h = img.height()
    ptr = img.constBits()
    arr = np.frombuffer(ptr, np.uint8).reshape((h, w, 4))
    return arr[:, :, :3][:, :, ::-1].copy()


def numpy_rgba_to_qimage(rgba: np.ndarray):
    """(reference qt_image.py:25-32)"""
    from PySide6.QtGui import QImage  # noqa: PLC0415

    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("rgba must be HxWx4 uint8")
    h, w = rgba.shape[:2]
    img = QImage(rgba.data, w, h, QImage.Format.Format_RGBA8888)
    return img.copy()


def composite_foreground_over_transparent(bgr: np.ndarray, mask01: np.ndarray) -> np.ndarray:
    """Compose BGR foreground over transparency (reference qt_image.py:35-44)."""
    if bgr.dtype != np.uint8 or bgr.ndim != 3 or bgr.shape[2] != 3:
        raise ValueError("bgr must be HxWx3 uint8")
    if mask01.dtype != np.uint8:
        mask01 = (mask01 > 0).astype(np.uint8)
    alpha = (mask01 * 255).astype(np.uint8)
    rgb = bgr[:, :, ::-1]
    return np.dstack([rgb, alpha])
