"""Reference-compatible tendril_trimming module (TPU backend)."""

from image_segmenter_tpu.compat.tendril_trimming import (  # noqa: F401
    TendrilTrimmer,
    trim_tendrils,
)
