"""Attribute the device-lane `copy` op family (ROADMAP round-5 trace:
7.27 ms x609 in the 44.3 ms FULL 4K b=4 lane) at the HLO level.

Compiles the Pipeline batch program for the session backend and parses the
optimized HLO for copy / copy-start instructions, aggregating by
(dtype, shape, operand-layout -> result-layout).  Layout-changing copies
are XLA's layout-solver choices around the u8 frame buffers and bf16 CNN
intermediates; this tells us exactly WHICH buffers convert and how many
bytes move, so the "layout pinning" opportunity can be sized before any
restructuring is attempted.

Usage: python bench/hlo_copies.py [H W B]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_DT_BYTES = {
    "pred": 1, "u8": 1, "s8": 1, "u16": 2, "s16": 2, "bf16": 2, "f16": 2,
    "u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8, "f64": 8,
}


def parse_copies(hlo: str):
    """Yield (dtype, dims, src_layout, dst_layout, bytes, line) per copy.

    Matches `X = TYPE[dims]{layout} copy(operand)` and copy-start; the
    operand's layout is looked up from its definition line when present.
    """
    # Map instruction name -> "type[dims]{layout}" for operand lookup.
    defline = re.compile(
        r"^\s*(?:ROOT\s+)?([%\w.\-]+)\s*=\s*\(?([a-z]+\d*)\[([\d,]*)\]"
        r"(?:\{([\d,a-zA-Z():#_\s]*)\})?")
    shapes: dict[str, tuple[str, str, str]] = {}
    copies = []
    for line in hlo.splitlines():
        m = defline.match(line)
        if not m:
            continue
        name, dt, dims, layout = m.group(1), m.group(2), m.group(3), m.group(4)
        shapes[name] = (dt, dims, layout or "")
        cm = re.search(r"\b(copy|copy-start)\(([%\w.\-]+)\)", line)
        if cm:
            op = cm.group(2)
            sdt, sdims, slay = shapes.get(op, ("?", "?", "?"))
            nelem = 1
            for d in (dims.split(",") if dims else []):
                if d:
                    nelem *= int(d)
            nbytes = nelem * _DT_BYTES.get(dt, 4)
            copies.append((dt, dims, slay, layout or "", nbytes, line.strip()))
    return copies


def main() -> int:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp

    from image_segmenter_tpu.pipeline.segment import Pipeline

    print(f"[hlo_copies] backend={jax.default_backend()} shape="
          f"({b},{h},{w},3)", file=sys.stderr)
    pipe = Pipeline(model="u2netp", k=16)
    imgs = jnp.zeros((b, h, w, 3), jnp.uint8)
    lowered = pipe._fn.lower(pipe.session.variables, imgs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"[hlo_copies] optimized HLO: {len(hlo.splitlines())} lines",
          file=sys.stderr)

    copies = parse_copies(hlo)
    agg: dict[tuple, tuple[int, int]] = defaultdict(lambda: (0, 0))
    for dt, dims, slay, dlay, nbytes, _ in copies:
        key = (dt, dims, slay, dlay)
        c, tb = agg[key]
        agg[key] = (c + 1, tb + nbytes)

    total_b = sum(tb for _, tb in agg.values())
    total_c = sum(c for c, _ in agg.values())
    print(f"{total_c} copy ops, {total_b/1e6:.1f} MB total "
          f"(~{total_b/293.6e9*1e3:.2f} ms at the 293.6 GB/s stream "
          f"envelope x2 for rd+wr = {2*total_b/293.6e9*1e3:.2f} ms)")
    print(f"{'count':>5} {'MB':>9} {'dtype':>5} {'dims':<22} src->dst layout")
    for (dt, dims, slay, dlay), (c, tb) in sorted(
            agg.items(), key=lambda kv: -kv[1][1])[:40]:
        print(f"{c:>5} {tb/1e6:>9.2f} {dt:>5} [{dims}]"
              f"{'':<{max(0, 20-len(dims))}} {{{slay}}} -> {{{dlay}}}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
