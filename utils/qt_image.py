"""Reference-compatible utils.qt_image module."""

from image_segmenter_tpu.utils.qt_image import (  # noqa: F401
    qimage_to_numpy_bgr,
    numpy_rgba_to_qimage,
    composite_foreground_over_transparent,
)
