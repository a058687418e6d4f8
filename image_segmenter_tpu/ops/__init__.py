"""Core image ops: color spaces, morphology, resize, histograms, components.

Everything here is pure JAX on statically-shaped arrays, safe under jit/pjit,
with float32 internals and uint8 at the boundaries. These are the TPU
re-implementations of the reference's third-party native surface (OpenCV /
skimage / PIL C paths) — see SURVEY.md §2 "Native component checklist".
"""
