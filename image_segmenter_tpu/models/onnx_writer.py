"""Minimal ONNX (protobuf) writer for U^2-Net-family checkpoints.

Counterpart of onnx_import.py, with two jobs:

1. Fixture generation: this environment has no network access and no
   onnx/onnxruntime, so the only way to exercise the importer against a
   REAL-layout rembg checkpoint (reference rembg_infer.py:16-22 loads
   ~/.u2net/<model>.onnx, a torch.onnx.export of U^2-Net) is to write one
   ourselves: state-dict-named initializers plus Conv/BatchNormalization/
   Relu nodes in forward-execution order, exactly the shape torch exports.
2. Export: serialize a trained Flax U2NET/ISNet back to an ONNX file that
   rembg/onnxruntime deployments can consume.

Only the protobuf fields the ONNX spec assigns to ModelProto(7=graph,
8=opset), GraphProto(1=node, 2=name, 5=initializer), NodeProto(1=input,
2=output, 3=name, 4=op_type), TensorProto(1=dims, 2=data_type, 8=name,
9=raw_data) are emitted — enough for netron/onnxruntime to parse the
weights and topology.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from image_segmenter_tpu.models import onnx_import as OIMP

_F32, _I64 = 1, 7  # TensorProto.DataType


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b7 = n & 0x7F
        n >>= 7
        out.append(b7 | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    dtype = _I64 if arr.dtype == np.int64 else _F32
    data = arr.astype(np.int64 if dtype == _I64 else np.float32).tobytes()
    msg = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
    msg += _field(2, 0, _varint(dtype))
    msg += _len_field(8, name.encode())
    msg += _len_field(9, data)
    return msg


def _node_proto(op: str, inputs: Sequence[str], outputs: Sequence[str],
                name: str = "") -> bytes:
    msg = b"".join(_len_field(1, s.encode()) for s in inputs)
    msg += b"".join(_len_field(2, s.encode()) for s in outputs)
    if name:
        msg += _len_field(3, name.encode())
    msg += _len_field(4, op.encode())
    return msg


def write_onnx(path: str, initializers: Dict[str, np.ndarray],
               nodes: List[Tuple[str, Sequence[str], Sequence[str]]],
               graph_name: str = "u2net") -> None:
    graph = b"".join(_len_field(1, _node_proto(op, ins, outs))
                     for op, ins, outs in nodes)
    graph += _len_field(2, graph_name.encode())
    graph += b"".join(_len_field(5, _tensor_proto(n, a))
                      for n, a in initializers.items())
    opset = _field(2, 0, _varint(11))  # OperatorSetIdProto.version
    model = _field(1, 0, _varint(7))   # ir_version
    model += _len_field(7, graph)
    model += _len_field(8, opset)
    with open(path, "wb") as f:
        f.write(model)


# ---------------------------------------------------------------------------
# torch-export-shaped graphs from a state dict
# ---------------------------------------------------------------------------

def _order_from_state(state: Dict[str, np.ndarray]):
    """Forward-execution (conv|bn, flax_path) order derived from torch
    state-dict names, via the same structural walk the importer uses."""
    fake: dict = {}
    for name in state:
        parts = name.split(".")
        mods = ["conv" if p == "conv_s1" else "bn" if p == "bn_s1" else p
                for p in parts[:-1]]
        if mods:
            OIMP._assign(fake, tuple(mods) + (parts[-1],), 0)
    return OIMP.call_order(fake)


def _torch_prefix(path: Tuple[str, ...], kind: str) -> str:
    if path[-1] == "conv":
        return ".".join(path[:-1]) + ".conv_s1"
    if path[-1] == "bn":
        return ".".join(path[:-1]) + ".bn_s1"
    return ".".join(path)  # side heads / outconv / conv_in


def graph_from_torch_state(state: Dict[str, np.ndarray],
                           positional: bool = False):
    """Build (initializers, nodes) in torch.onnx.export layout.

    With positional=True the initializer names are rewritten to the
    dot-free "onnx::Conv_<n>" style some optimizer passes produce, which
    forces the importer down its graph-order fallback.
    """
    order = _order_from_state(state)
    inits: Dict[str, np.ndarray] = {}
    nodes: List[Tuple[str, List[str], List[str]]] = []
    counter = [0]

    def reg(torch_name: str, arr: np.ndarray, op_hint: str) -> str:
        name = (f"onnx::{op_hint}_{counter[0]}" if positional else torch_name)
        counter[0] += 1
        inits[name] = arr
        return name

    cur = "input.1"
    t = [0]

    def fresh() -> str:
        t[0] += 1
        return f"/t_{t[0]}"

    i = 0
    while i < len(order):
        kind, path = order[i]
        prefix = _torch_prefix(path, kind)
        assert kind == "conv", (kind, path)
        conv_ins = [cur]
        if prefix + ".weight" in state:  # absent on truncated checkpoints
            conv_ins.append(reg(prefix + ".weight", state[prefix + ".weight"], "Conv"))
        if prefix + ".bias" in state:
            conv_ins.append(reg(prefix + ".bias", state[prefix + ".bias"], "Conv"))
        cur = fresh()
        nodes.append(("Conv", conv_ins, [cur]))
        follows_bn = i + 1 < len(order) and order[i + 1][0] == "bn"
        bnp = _torch_prefix(order[i + 1][1], "bn") if follows_bn else ""
        if follows_bn and bnp + ".weight" not in state:
            # BN folded into the conv at export: Conv -> Relu, no BN node.
            out = fresh()
            nodes.append(("Relu", [cur], [out]))
            cur = out
            i += 2
        elif follows_bn:
            bn_ins = [cur,
                      reg(bnp + ".weight", state[bnp + ".weight"], "BatchNormalization"),
                      reg(bnp + ".bias", state[bnp + ".bias"], "BatchNormalization"),
                      reg(bnp + ".running_mean", state[bnp + ".running_mean"], "BatchNormalization"),
                      reg(bnp + ".running_var", state[bnp + ".running_var"], "BatchNormalization")]
            cur = fresh()
            nodes.append(("BatchNormalization", bn_ins, [cur]))
            out = fresh()
            nodes.append(("Relu", [cur], [out]))
            cur = out
            i += 2
        else:
            i += 1
    out = fresh()
    nodes.append(("Sigmoid", [cur], [out]))
    return inits, nodes


def export_torch_state(path: str, state: Dict[str, np.ndarray],
                       positional: bool = False) -> None:
    """Write a torch-layout U^2-Net state dict as a rembg-shaped .onnx."""
    inits, nodes = graph_from_torch_state(state, positional=positional)
    write_onnx(path, inits, nodes)


def flax_to_torch_state(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse of the importer's name map: Flax variables -> torch state dict
    (conv kernels HWIO -> OIHW), for exporting trained models."""
    state: Dict[str, np.ndarray] = {}

    def walk(tree: dict, path: Tuple[str, ...], col: str):
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                walk(v, p, col)
                continue
            mods, leaf = p[:-1], p[-1]
            torch_mods = [
                "conv_s1" if m == "conv" else "bn_s1" if m == "bn" else m
                for m in mods
            ]
            prefix = ".".join(torch_mods)
            arr = np.asarray(v, np.float32)
            if leaf == "kernel":
                state[prefix + ".weight"] = np.transpose(arr, (3, 2, 0, 1))
            elif leaf == "scale":
                state[prefix + ".weight"] = arr
            elif leaf == "bias":
                state[prefix + ".bias"] = arr
            elif leaf == "mean":
                state[prefix + ".running_mean"] = arr
            elif leaf == "var":
                state[prefix + ".running_var"] = arr

    walk(variables["params"], (), "params")
    walk(variables.get("batch_stats", {}), (), "batch_stats")
    return state
