"""Dependency-free ONNX checkpoint reader + U^2-Net weight mapping.

rembg distributes its models as ONNX files (~/.u2net/<model>.onnx). This
module reads them WITHOUT onnx/onnxruntime (neither is a dependency): ONNX is
protobuf, and extracting initializer tensors + node topology needs only a
varint-level reader for three message types (ModelProto/GraphProto/
TensorProto). Torch-exported U^2-Net checkpoints keep module-path initializer
names ("stage1.rebnconv1.conv_s1.weight"), which map 1:1 onto the Flax
module tree in models/u2net.py; a graph-order fallback pairs Conv/BN nodes
positionally when names were stripped.

Conventions converted at load time:
- Conv kernels OIHW -> HWIO, inputs NCHW -> NHWC handled by the models.
- BatchNorm running stats land in flax `batch_stats`, gamma/beta in params.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5

_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
           10: np.float16, 11: np.float64}


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: memoryview):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == _VARINT:
            val, pos = _read_varint(buf, pos)
        elif wire == _I64:
            val = bytes(buf[pos:pos + 8])
            pos += 8
        elif wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == _I32:
            val = bytes(buf[pos:pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_tensor(buf: memoryview):
    dims: List[int] = []
    dtype = 1
    name = ""
    raw = None
    floats: List[float] = []
    int64s: List[int] = []
    for field, wire, val in _iter_fields(buf):
        if field == 1:  # dims (packed or repeated varint)
            if wire == _VARINT:
                dims.append(val)
            else:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    dims.append(v)
        elif field == 2 and wire == _VARINT:
            dtype = val
        elif field == 4:  # float_data
            if wire == _I32:
                floats.append(struct.unpack("<f", val)[0])
            else:
                floats.extend(np.frombuffer(bytes(val), np.float32).tolist())
        elif field == 7:  # int64_data
            if wire == _VARINT:
                int64s.append(val)
            else:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    int64s.append(v)
        elif field == 8:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 9:
            raw = bytes(val)
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, np_dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif int64s:
        arr = np.asarray(int64s, np.int64)
    else:
        arr = np.zeros(0, np_dtype)
    if dims:
        arr = arr.reshape(dims)
    return name, arr.astype(np_dtype, copy=False)


def _parse_node(buf: memoryview):
    inputs, outputs, op = [], [], ""
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            inputs.append(bytes(val).decode("utf-8", "replace"))
        elif field == 2:
            outputs.append(bytes(val).decode("utf-8", "replace"))
        elif field == 4:
            op = bytes(val).decode("utf-8", "replace")
    return op, inputs, outputs


def read_onnx(path: str):
    """Parse an ONNX file -> (initializers dict name->array, nodes list)."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    graph = None
    for field, wire, val in _iter_fields(data):
        if field == 7 and wire == _LEN:  # ModelProto.graph
            graph = val
            break
    if graph is None:
        raise ValueError(f"{path}: no graph found (not an ONNX model?)")
    inits: Dict[str, np.ndarray] = {}
    nodes = []
    for field, wire, val in _iter_fields(graph):
        if field == 5 and wire == _LEN:  # initializer
            name, arr = _parse_tensor(val)
            inits[name] = arr
        elif field == 1 and wire == _LEN:  # node
            nodes.append(_parse_node(val))
    return inits, nodes


# ---------------------------------------------------------------------------
# mapping torch-named initializers -> flax variables
# ---------------------------------------------------------------------------

def _assign(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _rsu_block_order(sub: dict) -> List[str]:
    """Execution order of REBNCONV submodules inside one RSU / RSU4F block.

    torch U^2-Net forward order (mirrored by models/u2net.py): rebnconvin,
    rebnconv1..rebnconvN ascending (encoder + dilated bottom), then
    rebnconv(N-1)d..rebnconv1d descending (decoder).
    """
    import re

    enc = sorted(int(m.group(1)) for k in sub
                 if (m := re.fullmatch(r"rebnconv(\d+)", k)))
    dec = sorted((int(m.group(1)) for k in sub
                  if (m := re.fullmatch(r"rebnconv(\d+)d", k))), reverse=True)
    order = []
    if "rebnconvin" in sub:
        order.append("rebnconvin")
    order += [f"rebnconv{i}" for i in enc]
    order += [f"rebnconv{i}d" for i in dec]
    return order


def call_order(params: dict) -> List[Tuple[str, Tuple[str, ...]]]:
    """Forward-execution order of conv/bn leaves of a U2NET/ISNet params tree.

    Returns [("conv"|"bn", module_path), ...] in the order the torch models
    (and torch.onnx.export graph topological order) execute them: conv_in
    (ISNet), encoder stages ascending, decoder stages descending, side heads,
    outconv. Used to pair graph-order Conv/BatchNormalization nodes with Flax
    modules when an export stripped the state-dict initializer names.
    """
    import re

    order: List[Tuple[str, Tuple[str, ...]]] = []
    if "conv_in" in params:
        order.append(("conv", ("conv_in",)))
    enc = sorted(int(m.group(1)) for k in params
                 if (m := re.fullmatch(r"stage(\d+)", k)))
    dec = sorted((int(m.group(1)) for k in params
                  if (m := re.fullmatch(r"stage(\d+)d", k))), reverse=True)
    stages = [f"stage{i}" for i in enc] + [f"stage{i}d" for i in dec]
    for st in stages:
        for blk in _rsu_block_order(params[st]):
            order.append(("conv", (st, blk, "conv")))
            order.append(("bn", (st, blk, "bn")))
    sides = sorted((k for k in params if re.fullmatch(r"side\d+", k)),
                   key=lambda k: int(k[4:]))
    for s in sides:
        order.append(("conv", (s,)))
    if "outconv" in params:
        order.append(("conv", ("outconv",)))
    return order


def map_u2net_weights(inits: Dict[str, np.ndarray]):
    """Map torch-module-named initializers onto the Flax U2NET/ISNet tree.

    Returns (params, batch_stats) nested dicts, or raises KeyError-style
    ValueError when names are positional (caller falls back to random init).
    """
    params: dict = {}
    stats: dict = {}
    mapped = 0
    for name, arr in inits.items():
        parts = name.split(".")
        if len(parts) < 2:
            continue
        leaf = parts[-1]
        mods = parts[:-1]
        # torch REBNCONV submodules: conv_s1 / bn_s1
        flax_path = []
        for m in mods:
            if m == "conv_s1":
                flax_path.append("conv")
            elif m == "bn_s1":
                flax_path.append("bn")
            else:
                flax_path.append(m)
        if not flax_path:
            continue
        kind = flax_path[-1]
        if kind == "conv" or flax_path[-1].startswith("side") or flax_path[-1] in ("outconv", "conv_in"):
            if leaf == "weight":
                _assign(params, tuple(flax_path) + ("kernel",),
                        np.transpose(arr, (2, 3, 1, 0)))  # OIHW -> HWIO
                mapped += 1
            elif leaf == "bias":
                _assign(params, tuple(flax_path) + ("bias",), arr)
                mapped += 1
        elif kind == "bn":
            if leaf == "weight":
                _assign(params, tuple(flax_path) + ("scale",), arr)
            elif leaf == "bias":
                _assign(params, tuple(flax_path) + ("bias",), arr)
            elif leaf == "running_mean":
                _assign(stats, tuple(flax_path) + ("mean",), arr)
            elif leaf == "running_var":
                _assign(stats, tuple(flax_path) + ("var",), arr)
            mapped += 1
    if mapped == 0:
        raise ValueError("no module-named initializers found (positional export?)")
    return params, stats


def map_positional(inits: Dict[str, np.ndarray], nodes, variables: dict):
    """Graph-order fallback: pair Conv/BatchNormalization node weights with
    Flax modules by execution position when initializer names were stripped
    (e.g. optimizer-renamed "onnx::Conv_123" exports).

    torch.onnx.export emits nodes in forward execution order, which is the
    order `call_order` reproduces structurally from the target tree.
    """
    conv_srcs: List[Tuple[np.ndarray, np.ndarray]] = []  # (weight, bias|None)
    bn_srcs: List[Tuple[np.ndarray, ...]] = []           # (scale, bias, mean, var)
    for op, ins, _outs in nodes:
        weights = [inits[n] for n in ins if n in inits]
        if op == "Conv" and weights:
            w = weights[0]
            b = weights[1] if len(weights) > 1 else None
            conv_srcs.append((w, b))
        elif op == "BatchNormalization" and len(weights) >= 4:
            bn_srcs.append(tuple(weights[:4]))

    order = call_order(variables["params"])
    conv_paths = [p for kind, p in order if kind == "conv"]
    bn_paths = [p for kind, p in order if kind == "bn"]
    if len(conv_srcs) != len(conv_paths):
        raise ValueError(
            f"positional map: graph has {len(conv_srcs)} Conv nodes with "
            f"initializer weights, model expects {len(conv_paths)}")
    if bn_srcs and len(bn_srcs) != len(bn_paths):
        raise ValueError(
            f"positional map: graph has {len(bn_srcs)} BatchNormalization "
            f"nodes, model expects {len(bn_paths)}")

    params: dict = {}
    stats: dict = {}
    for path, (w, b) in zip(conv_paths, conv_srcs):
        _assign(params, path + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
        if b is not None:
            _assign(params, path + ("bias",), b)
    for path, (scale, bias, mean, var) in zip(bn_paths, bn_srcs):
        _assign(params, path + ("scale",), scale)
        _assign(params, path + ("bias",), bias)
        _assign(stats, path + ("mean",), mean)
        _assign(stats, path + ("var",), var)
    return params, stats


class LoadReport:
    """Accounting for a checkpoint import: every target leaf must be mapped
    (or provably identity, for BatchNorm stats of a BN-folded export)."""

    def __init__(self):
        self.total = 0
        self.mapped = 0
        self.folded_bn = 0
        self.missing: List[str] = []
        self.shape_mismatch: List[str] = []
        self.mode = "named"

    @property
    def complete(self) -> bool:
        return self.mapped + self.folded_bn == self.total and self.total > 0

    def summary(self) -> str:
        s = (f"{self.mapped}/{self.total} leaves mapped ({self.mode})"
             + (f", {self.folded_bn} BN leaves identity (folded export)"
                if self.folded_bn else ""))
        if self.missing:
            s += f"; MISSING: {self.missing[:8]}{'...' if len(self.missing) > 8 else ''}"
        if self.shape_mismatch:
            s += f"; SHAPE MISMATCH: {self.shape_mismatch[:8]}"
        return s


def load_into_variables(variables: dict, path: str, *, strict: bool = True):
    """Load an ONNX checkpoint into a Flax variables dict (params+batch_stats).

    Tries the torch state-dict name mapping first, then the graph-order
    positional fallback. Returns (new_variables, LoadReport). With
    strict=True (default) raises RuntimeError unless EVERY target leaf was
    mapped — a partially-mapped checkpoint silently producing garbage masks
    is the failure mode this guards against (reference rembg_infer.py:52-54
    runs fully-trained checkpoints; partial state has no analog there).
    """
    inits, nodes = read_onnx(path)
    has_bn_nodes = any(op == "BatchNormalization" for op, _i, _o in nodes)

    def lookup(tree: dict, path: Tuple[str, ...]):
        node = tree
        for k in path:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return node

    def run_merge(params_in, stats_in, mode):
        report = LoadReport()
        report.mode = mode

        def merge(dst, src, col: str, prefix=()):
            out = {}
            for k, v in dst.items():
                path_ = prefix + (k,)
                if isinstance(v, dict):
                    out[k] = merge(v, src, col, path_)
                    continue
                report.total += 1
                cand = lookup(src, path_)
                name = col + "/" + "/".join(path_)
                if cand is None:
                    is_bn_leaf = len(path_) >= 2 and path_[-2] == "bn"
                    if is_bn_leaf and not has_bn_nodes:
                        report.folded_bn += 1  # BN folded into convs at export
                    else:
                        report.missing.append(name)
                    out[k] = v
                elif np.shape(cand) != np.shape(v):
                    report.shape_mismatch.append(
                        f"{name}: ckpt{np.shape(cand)} vs model{np.shape(v)}")
                    out[k] = v
                else:
                    out[k] = np.asarray(cand, dtype=np.asarray(v).dtype)
                    report.mapped += 1
            return out

        new_params = merge(dict(variables["params"]), params_in, "params")
        new_stats = merge(dict(variables.get("batch_stats", {})), stats_in,
                          "batch_stats")
        return {"params": new_params, "batch_stats": new_stats}, report

    # Named mapping first; fall back to graph-order positional pairing not
    # only when the named map fails outright but also when it maps the tree
    # INCOMPLETELY — optimizer passes commonly rename just the initializers
    # they touch ('onnx::Conv_n' style), which leaves some names mappable
    # while positional pairing (which ignores names entirely) can still map
    # 100%. The better of the two reports wins.
    named_result = None
    try:
        params_in, stats_in = map_u2net_weights(inits)
        named_result = run_merge(params_in, stats_in, "named")
    except ValueError:
        pass
    if named_result is not None and named_result[1].complete:
        new_vars, report = named_result
    else:
        try:
            params_in, stats_in = map_positional(inits, nodes, variables)
            pos_result = run_merge(params_in, stats_in, "graph-order")
        except ValueError:
            pos_result = None
        candidates = [r for r in (named_result, pos_result) if r is not None]
        if not candidates:
            raise RuntimeError(f"ONNX import failed: no weight mapping "
                               f"strategy applied [{path}]")
        new_vars, report = max(
            candidates, key=lambda r: (r[1].complete, r[1].mapped))

    if strict and not report.complete:
        raise RuntimeError(f"ONNX import incomplete: {report.summary()} [{path}]")
    return new_vars, report
