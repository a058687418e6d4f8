"""Reference-compatible grabcut module (TPU backend)."""

from image_segmenter_tpu.compat.grabcut import apply_grabcut  # noqa: F401
