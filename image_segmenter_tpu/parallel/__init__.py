"""Multi-chip parallelism: mesh construction, sharding specs, halo exchange.

The reference is a single-process desktop app with NO distributed backend
(SURVEY.md §2 "Parallelism & distributed backend"); this layer is new design.
Scaling axes:

- data ("dp"): batch of images sharded across chips; XLA inserts nothing —
  embarrassingly parallel until reductions (k-means center psum).
- space ("sp"): H axis of the pixel grid sharded across chips; convolutions
  and shift stencils partition under GSPMD with automatic halo exchange, and
  explicit `shard_map` + ppermute halos serve the hand-written stencil loops.

Collectives ride ICI within a slice (psum for k-means center sums / CG dot
products / histograms, ppermute for halos, all_gather for palettes/GMMs).
"""
