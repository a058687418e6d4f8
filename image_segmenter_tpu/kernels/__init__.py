"""Fused/scan kernels for the stencil-shaped hot loops.

The reference's per-pixel Python loops (tendril run-length marking,
majority-vote smoothing, scan-line recoloring) become XLA prefix scans and
fused shift stencils here; Pallas variants exist where manual fusion beats
XLA (see pallas_kernels.py).
"""
