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


def load_into_variables(variables: dict, path: str) -> dict:
    """Load an ONNX checkpoint into a Flax variables dict (params+batch_stats).

    Leaves any unmatched variables at their initialized values and returns a
    new variables dict; raises if the file parses but nothing maps.
    """
    import jax

    inits, _nodes = read_onnx(path)
    params_in, stats_in = map_u2net_weights(inits)

    def merge(dst, src, cast_to):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {}), cast_to)
            elif k in src and np.shape(src[k]) == np.shape(v):
                out[k] = np.asarray(src[k], dtype=cast_to(v))
            else:
                out[k] = v
        return out

    dtype_of = lambda v: np.asarray(v).dtype  # keep init dtypes
    new_params = merge(jax.tree.map(lambda x: x, variables["params"]), params_in, dtype_of)
    new_stats = merge(jax.tree.map(lambda x: x, variables.get("batch_stats", {})),
                      stats_in, dtype_of)
    return {"params": new_params, "batch_stats": new_stats}
