"""Attribute device-trace op names (while.129, body.6, copy families) to
source via HLO metadata (ROADMAP round-5 trace: "attribution would need an
HLO cross-check pass like r4's").

Compiles the Pipeline batch program ONCE, saves the optimized HLO text (so
re-analysis never pays the 1-5 min tunnel recompile), then:

- lists every `while` instruction with its op_name/source_file/source_line
  metadata and the size of its carried tuple;
- for each while BODY computation, aggregates the instruction count and
  the op families inside (what the trace's `body.N` buckets spend on);
- re-runs the copy aggregation from hlo_copies.py for continuity.

Usage:
  python bench/hlo_attr.py [H W B]            # compile + save + analyze
  python bench/hlo_attr.py --load FILE        # analyze a saved HLO text
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hlo_copies import parse_copies  # noqa: E402

_META = re.compile(
    r'metadata=\{[^}]*?op_name="([^"]*)"'
    r'(?:[^}]*?source_file="([^"]*)")?(?:[^}]*?source_line=(\d+))?')


def _computations(hlo: str) -> dict[str, list[str]]:
    """Split HLO text into computation-name -> body lines."""
    comps: dict[str, list[str]] = {}
    cur = None
    for line in hlo.splitlines():
        # computation headers: `%name (args) -> type {` — the arg tuple
        # nests parens, so match greedily to the last `) ->`
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->.*\{\s*$",
                     line)
        if m and ("->" in line):
            cur = m.group(1)
            comps[cur] = []
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is not None:
            comps[cur].append(line)
    return comps


def analyze(hlo: str) -> None:
    comps = _computations(hlo)

    # --- while instructions: name, body computation, metadata ---------
    wre = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\([^=]*while\("
        r".*?condition=%?([\w.\-]+),\s*body=%?([\w.\-]+)", re.DOTALL)
    print("== while instructions ==")
    while_bodies: set[str] = set()
    for cname, lines in comps.items():
        for line in lines:
            if " while(" not in line:
                continue
            m = re.search(r"%?([\w.\-]+)\s*=.*?while\(.*?body=%?([\w.\-]+)",
                          line)
            if not m:
                continue
            name, body = m.group(1), m.group(2)
            while_bodies.add(body)
            meta = _META.search(line)
            op, sf, sl = (meta.groups() if meta else ("?", None, None))
            nb = len(comps.get(body, []))
            print(f"  {name:<18} body={body:<14} body_lines={nb:<4} "
                  f"op_name={op}")
            if sf:
                print(f"  {'':<18} src={sf}:{sl}")

    # --- per-body op-family aggregation -------------------------------
    print("\n== while-body op families (bodies with >10 instructions) ==")
    for cname, lines in comps.items():
        if cname not in while_bodies or len(lines) <= 10:
            continue
        fam: dict[str, int] = defaultdict(int)
        srcs: dict[str, int] = defaultdict(int)
        for line in lines:
            m = re.match(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*\S+\s+(\w[\w\-]*)\(",
                         line)
            if m:
                fam[m.group(1)] += 1
            meta = _META.search(line)
            if meta and meta.group(2):
                srcs[f"{os.path.basename(meta.group(2))}:{meta.group(3)}"] += 1
        top = sorted(fam.items(), key=lambda kv: -kv[1])[:8]
        tsrc = sorted(srcs.items(), key=lambda kv: -kv[1])[:5]
        print(f"  {cname} ({len(lines)} lines): "
              + ", ".join(f"{k} x{v}" for k, v in top))
        if tsrc:
            print(f"    top sources: " + ", ".join(f"{k} x{v}"
                                                   for k, v in tsrc))

    # --- copies (continuity with hlo_copies.py) -----------------------
    copies = parse_copies(hlo)
    agg: dict[tuple, tuple[int, int]] = defaultdict(lambda: (0, 0))
    for dt, dims, slay, dlay, nbytes, _ in copies:
        c, tb = agg[(dt, dims, slay, dlay)]
        agg[(dt, dims, slay, dlay)] = (c + 1, tb + nbytes)
    total_b = sum(tb for _, tb in agg.values())
    print(f"\n== copies: {sum(c for c, _ in agg.values())} ops, "
          f"{total_b/1e6:.1f} MB (top 10) ==")
    for (dt, dims, slay, dlay), (c, tb) in sorted(
            agg.items(), key=lambda kv: -kv[1][1])[:10]:
        print(f"  {c:>4} x {tb/1e6:>8.2f} MB {dt}[{dims}] "
              f"{{{slay}}}->{{{dlay}}}")


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--load":
        with open(sys.argv[2]) as f:
            analyze(f.read())
        return 0

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp

    from image_segmenter_tpu.pipeline.segment import Pipeline

    print(f"[hlo_attr] backend={jax.default_backend()} shape="
          f"({b},{h},{w},3)", file=sys.stderr)
    pipe = Pipeline(model="u2netp", k=16)
    imgs = jnp.zeros((b, h, w, 3), jnp.uint8)
    compiled = pipe._fn.lower(pipe.session.variables, imgs).compile()
    hlo = compiled.as_text()
    out = f"/tmp/iseg_hlo_{h}x{w}b{b}.txt"
    with open(out, "w") as f:
        f.write(hlo)
    print(f"[hlo_attr] saved {len(hlo.splitlines())} HLO lines -> {out}",
          file=sys.stderr)
    analyze(hlo)
    return 0


if __name__ == "__main__":
    sys.exit(main())
