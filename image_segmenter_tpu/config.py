"""Framework configuration: the reference app's hardcoded widget defaults.

The reference has no config system; every parameter is Qt-widget state with a
hardcoded default (see /root/reference/app/ui/*.py). This module centralizes
those exact defaults so compat-layer function signatures keep the same keyword
defaults as the reference API.

Citations into /root/reference:
- brush size 24, range 3-100 ............ app/ui/bg_tools_panel.py:53-56
- AI opacity threshold 128, 0-255 ....... app/ui/bg_tools_panel.py:63-66
- rembg default model ................... app/ui/main_window.py:460, bg_tools_panel.py:153
- num_colors 8, range 2-256 ............. app/ui/color_processing_panel.py:110-113
- min region size 100, range 10-1000 .... app/ui/region_cleanup_panel.py:189-196
- auto-merge threshold 70% .............. app/ui/region_cleanup_panel.py:207-218
- connectivity 8 (combo 8/4) ............ app/ui/region_cleanup_panel.py:226-230
- smoothing strength 50% ................ app/ui/region_cleanup_panel.py:297-337
- grabcut iterations 10 ................. app/ui/main_window.py:300,318,363,365
- region-merge pass cap 20 .............. app/processing/region_cleanup.py:368
- tendril threshold 2 / iter cap 30 ..... app/test_smoothing_algorithms.py:455-457,
                                          app/processing/tendril_trimming.py:33
- kmeans seed 42 / n_init 10 ............ app/processing/color_simplify.py:79
- matting max dim 1024 .................. app/processing/matting_refine.py:105
- perceptual_fast max dim 512 / 5000 .... app/processing/color_simplify.py:608,632
- perceptual sample cap 10000 ........... app/processing/color_simplify.py:393
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Defaults:
    # Brush / UI-facing
    brush_size: int = 24
    opacity_threshold: int = 128
    rembg_model: str = "isnet-general-use"

    # Color simplification
    num_colors: int = 8
    kmeans_seed: int = 42
    kmeans_n_init: int = 10
    perceptual_max_samples: int = 10000
    perceptual_fast_max_dim: int = 512
    perceptual_fast_max_samples: int = 5000

    # Region cleanup
    min_region_size: int = 100
    auto_merge_threshold: float = 0.7
    connectivity: int = 8
    merge_max_passes: int = 20
    smoothing_strength: float = 0.5

    # GrabCut
    grabcut_iterations: int = 10
    grabcut_gmm_components: int = 5
    # After the EM alternations, propose GMM split-merge moves and keep the
    # best mask under the standardized energy (solvers/grabcut.py
    # _splitmerge_polish) — escapes the EM local optima cv.grabCut is stuck
    # with on quantized/few-color images. False reproduces the plain
    # alternation (one deterministic cv2-style run).
    grabcut_splitmerge: bool = True
    # Above this max-dim the polish CANDIDATE SEARCH runs on an
    # AREA-downscaled image (GMM candidates live in color space); only the
    # winner is continued + accepted at full resolution, bounding the
    # interactive cost of the polish on working-size images.
    grabcut_polish_search_dim: int = 256
    # When the alternation collapses to an (almost) empty foreground —
    # statistically-homogeneous scenes make all-BG an ABSORBING state: zero
    # FG weights degenerate the FG GMM, whose data term then repels every
    # pixel forever — re-run the alternations with a core of the init-FG
    # region temporarily clamped to hard FG so the GMMs specialize, release
    # the clamp, and keep whichever trajectory wins the standardized mask
    # energy. cv.grabCut (reference grabcut.py:52-54) never collapses on
    # these scenes only because its kmeans init lands elsewhere; this makes
    # the non-collapse basin reachable deterministically.
    grabcut_collapse_restart: bool = True

    # Matting
    matting_max_dim: int = 1024
    matting_fg_threshold: int = 220
    matting_bg_threshold: int = 20
    # host-f64 CG polish of certified f32 matting solves (warm-started at
    # the f32 alpha; closes the f32-operator/rtol gap to pymatting's exact
    # eps + rtol=1e-7 semantics at a few-iteration cost). Reference parity:
    # pymatting is ALWAYS f64, so True is the reference-faithful default.
    matting_f64_polish: bool = True
    # Run the reference-precision rungs (the polish above and the full
    # exact-eps solve for quantized-flat inputs) in device-resident
    # compensated double-f32 (solvers/matting_dd.py) when the computation
    # targets TPU, instead of f64 on the host CPU (a single core in this
    # container: 11-16 s per 1024x768 refine). Same certification contract
    # (TRUE residual <= rtol); False forces the host-f64 path everywhere.
    matting_dd: bool = True

    # Tendril trimming
    tendril_threshold: int = 2
    tendril_max_iterations: int = 30

    # TPU-native knobs (no reference counterpart)
    # When True, compat functions reproduce reference bugs bit-for-bit
    # (e.g. kmeans all-black output, color_simplify.py:90). Default False:
    # we implement the documented *intent*.
    bug_compat: bool = False


DEFAULTS = Defaults()

# rembg model ids the reference UI exposes (app/ui/bg_tools_panel.py:142-149)
REMBG_MODELS = (
    "isnet-general-use",
    "u2net",
    "u2netp",
    "u2net_human_seg",
    "u2net_cloth_seg",
    "isnet-anime",
    "silueta",
)
