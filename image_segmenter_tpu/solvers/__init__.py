"""Numerical solvers: clustering, matting CG, GMM-EM, grid min-cut.

TPU-native replacements for the reference's sklearn/pymatting/OpenCV solver
surface (SURVEY.md §2 native checklist items 2-4, 6). All solvers are
fixed-shape jitted programs: data-dependent loop counts become
`lax.while_loop`s with explicit caps, and per-point work is blocked into
MXU-shaped matmuls.
"""
