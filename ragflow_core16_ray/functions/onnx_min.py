"""Minimal ONNX: wire-format reader/writer + a numpy graph executor.

The reference loads ``det.onnx`` / ``rec.onnx`` / ``layout.onnx`` /
``tsr.onnx`` through onnxruntime with a per-process session cache
(deepdoc/vision/ocr.py:70-126, layout_recognizer.py:31-161,
table_structure_recognizer.py:29-92). Neither ``onnxruntime`` nor the
``onnx`` package exists in this sandbox, so this module implements the
subset needed to LOAD real .onnx bytes and EXECUTE feed-forward vision
graphs with numpy kernels:

- a hand-rolled protobuf **wire-format** parser (ONNX models are plain
  protobuf: ModelProto → GraphProto → NodeProto/TensorProto — the field
  numbers below come from the public onnx.proto3 schema),
- a topological numpy executor for the feed-forward op set
  (Conv/Relu/Sigmoid/MaxPool/MatMul/Gemm/Add/Mul/Reshape/Flatten/
  Transpose/Concat/Softmax/ArgMax/Identity),
- a writer (same wire format) so tests can self-train tiny models and
  round-trip them through real serialized .onnx bytes.

Swap-in point for production: ``OnnxSession`` has onnxruntime's
``run(output_names, feeds)`` shape — a deployment with onnxruntime
available replaces the executor with an InferenceSession behind the
same class, and nothing upstream changes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- wire ---

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) triples of one message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == _WIRE_VARINT:
            v, i = _read_varint(buf, i)
        elif wire == _WIRE_I64:
            v = buf[i:i + 8]
            i += 8
        elif wire == _WIRE_LEN:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == _WIRE_I32:
            v = buf[i:i + 4]
            i += 4
        else:  # wire types 3/4 (groups) do not occur in onnx.proto3
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def _packed_varints(v: bytes) -> list[int]:
    out, i = [], 0
    while i < len(v):
        x, i = _read_varint(v, i)
        out.append(x)
    return out


def _signed(x: int) -> int:
    """Protobuf int64 varints are two's-complement in 64 bits."""
    return x - (1 << 64) if x >= (1 << 63) else x


# ONNX TensorProto.DataType → numpy
_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
           7: np.int64, 9: np.bool_, 11: np.float64}


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = 1
    name = ""
    raw = b""
    float_data: list[float] = []
    int_data: list[int] = []
    for field, wire, v in _fields(buf):
        if field == 1:
            dims.extend(_packed_varints(v) if wire == _WIRE_LEN
                        else [v])
        elif field == 2:
            dtype = v
        elif field == 4:   # float_data (packed floats)
            float_data.extend(np.frombuffer(v, "<f4").tolist()
                              if wire == _WIRE_LEN
                              else [struct.unpack("<f", v)[0]])
        elif field in (5, 7):   # int32_data / int64_data (packed varints)
            int_data.extend(_signed(x) for x in (
                _packed_varints(v) if wire == _WIRE_LEN else [v]))
        elif field == 8:
            name = v.decode()
        elif field == 9:
            raw = v
    np_t = _DTYPES.get(dtype, np.float32)
    if raw:
        arr = np.frombuffer(raw, np_t)
    elif float_data:
        arr = np.asarray(float_data, np_t)
    else:
        arr = np.asarray(int_data, np_t)
    return name, arr.reshape(dims) if dims else arr


def _parse_attr(buf: bytes) -> tuple[str, object]:
    name = ""
    val: object = None
    for field, wire, v in _fields(buf):
        if field == 1:
            name = v.decode()
        elif field == 2:      # f
            val = struct.unpack("<f", v)[0]
        elif field == 3:      # i
            val = _signed(v)
        elif field == 4:      # s
            val = v
        elif field == 5:      # t
            val = _parse_tensor(v)[1]
        elif field == 7:      # floats
            val = (np.frombuffer(v, "<f4").tolist()
                   if wire == _WIRE_LEN else [struct.unpack("<f", v)[0]])
        elif field == 8:      # ints
            val = ([_signed(x) for x in _packed_varints(v)]
                   if wire == _WIRE_LEN else [_signed(v)])
    return name, val


def _parse_node(buf: bytes) -> dict:
    node = {"input": [], "output": [], "op_type": "", "attrs": {}}
    for field, _wire, v in _fields(buf):
        if field == 1:
            node["input"].append(v.decode())
        elif field == 2:
            node["output"].append(v.decode())
        elif field == 4:
            node["op_type"] = v.decode()
        elif field == 5:
            k, a = _parse_attr(v)
            node["attrs"][k] = a
    return node


def _value_info_name(buf: bytes) -> str:
    for field, _wire, v in _fields(buf):
        if field == 1:
            return v.decode()
    return ""


def load_model(data: bytes) -> dict:
    """Serialized ModelProto bytes → {nodes, initializers, inputs,
    outputs, name}."""
    graph_buf = None
    for field, _wire, v in _fields(data):
        if field == 7:            # ModelProto.graph
            graph_buf = v
    if graph_buf is None:
        raise ValueError("not an ONNX model: no graph")
    g = {"nodes": [], "initializers": {}, "inputs": [], "outputs": [],
         "name": ""}
    for field, _wire, v in _fields(graph_buf):
        if field == 1:
            g["nodes"].append(_parse_node(v))
        elif field == 2:
            g["name"] = v.decode()
        elif field == 5:
            k, t = _parse_tensor(v)
            g["initializers"][k] = t
        elif field == 11:
            g["inputs"].append(_value_info_name(v))
        elif field == 12:
            g["outputs"].append(_value_info_name(v))
    # graph inputs include initializers in some exporters; keep only feeds
    g["inputs"] = [i for i in g["inputs"] if i not in g["initializers"]]
    return g


# ------------------------------------------------------------ executor ---

def _conv2d(x, w, b, strides, pads):
    n, cin, h, wd = x.shape
    cout, _cin, kh, kw = w.shape
    sh, sw = strides
    pt, pl, pb, pr = pads
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    oh = (xp.shape[2] - kh) // sh + 1
    ow = (xp.shape[3] - kw) // sw + 1
    win = np.lib.stride_tricks.sliding_window_view(
        xp, (kh, kw), axis=(2, 3))[:, :, ::sh, ::sw]   # n,cin,oh,ow,kh,kw
    out = np.einsum("nchwij,ocij->nohw", win, w, optimize=True)
    if b is not None:
        out = out + b[None, :, None, None]
    return out.astype(np.float32, copy=False).reshape(n, cout, oh, ow)


def _maxpool(x, kshape, strides, pads):
    kh, kw = kshape
    sh, sw = strides
    pt, pl, pb, pr = pads
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
                constant_values=-np.inf)
    win = np.lib.stride_tricks.sliding_window_view(
        xp, (kh, kw), axis=(2, 3))[:, :, ::sh, ::sw]
    return win.max(axis=(-2, -1)).astype(np.float32, copy=False)


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class OnnxSession:
    """Load-once / run-many session over the numpy executor — the
    onnxruntime.InferenceSession stand-in (same ``run`` signature)."""

    def __init__(self, model_bytes: bytes):
        self.graph = load_model(model_bytes)
        self.input_names = list(self.graph["inputs"])
        self.output_names = list(self.graph["outputs"])

    def run(self, output_names, feeds: dict) -> list[np.ndarray]:
        vals: dict[str, np.ndarray] = dict(self.graph["initializers"])
        vals.update({k: np.asarray(v) for k, v in feeds.items()})
        for node in self.graph["nodes"]:
            self._exec(node, vals)
        names = output_names or self.output_names
        return [vals[n] for n in names]

    def _exec(self, node: dict, vals: dict) -> None:
        op = node["op_type"]
        a = node["attrs"]
        x = [vals[i] if i else None for i in node["input"]]
        if op == "Conv":
            strides = a.get("strides", [1, 1])
            pads = a.get("pads", [0, 0, 0, 0])
            y = _conv2d(x[0], x[1], x[2] if len(x) > 2 else None,
                        strides, pads)
        elif op == "Relu":
            y = np.maximum(x[0], 0)
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-x[0]))
        elif op == "MaxPool":
            y = _maxpool(x[0], a["kernel_shape"],
                         a.get("strides", [1, 1]),
                         a.get("pads", [0, 0, 0, 0]))
        elif op == "MatMul":
            y = (x[0] @ x[1]).astype(np.float32, copy=False)
        elif op == "Gemm":
            A = x[0].T if a.get("transA") else x[0]
            B = x[1].T if a.get("transB") else x[1]
            y = (a.get("alpha", 1.0) * (A @ B)).astype(np.float32,
                                                       copy=False)
            if len(x) > 2 and x[2] is not None:
                y = y + a.get("beta", 1.0) * x[2]
        elif op == "Add":
            y = x[0] + x[1]
        elif op == "Mul":
            y = x[0] * x[1]
        elif op == "Reshape":
            y = x[0].reshape([int(d) for d in x[1]])
        elif op == "Flatten":
            ax = a.get("axis", 1)
            y = x[0].reshape(int(np.prod(x[0].shape[:ax]) or 1), -1)
        elif op == "Transpose":
            y = np.transpose(x[0], a.get("perm"))
        elif op == "Concat":
            y = np.concatenate([v for v in x], axis=a.get("axis", 0))
        elif op == "Softmax":
            y = _softmax(x[0], a.get("axis", -1))
        elif op == "ArgMax":
            ax = a.get("axis", 0)
            y = np.argmax(x[0], axis=ax)
            if a.get("keepdims", 1):
                y = np.expand_dims(y, ax)
        elif op == "Identity":
            y = x[0]
        else:
            raise NotImplementedError(f"op {op} not in the numpy subset")
        vals[node["output"][0]] = y


# -------------------------------------------------------------- writer ---

def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, _WIRE_LEN) + _varint(len(payload)) + payload


def _vi(field: int, x: int) -> bytes:
    return _tag(field, _WIRE_VARINT) + _varint(x & ((1 << 64) - 1))


def make_tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
          np.dtype(np.int32): 6, np.dtype(np.uint8): 2,
          np.dtype(np.float64): 11}[arr.dtype]
    out = b"".join(_vi(1, int(d)) for d in arr.shape)
    out += _vi(2, dt)
    out += _ld(9, arr.tobytes())
    out += _ld(8, name.encode())
    return out


def _attr(name: str, val) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(val, float):
        out += _tag(2, _WIRE_I32) + struct.pack("<f", val) + _vi(20, 1)
    elif isinstance(val, int):
        out += _vi(3, val) + _vi(20, 2)
    elif isinstance(val, bytes):
        out += _ld(4, val) + _vi(20, 3)
    elif isinstance(val, (list, tuple)) and val \
            and isinstance(val[0], float):
        out += _ld(7, b"".join(struct.pack("<f", v) for v in val))
        out += _vi(20, 6)
    elif isinstance(val, (list, tuple)):
        out += _ld(8, b"".join(_varint(int(v) & ((1 << 64) - 1))
                               for v in val))
        out += _vi(20, 7)
    else:
        raise TypeError(f"attr {name}: {type(val)}")
    return out


def make_node(op_type: str, inputs: list[str], outputs: list[str],
              **attrs) -> bytes:
    out = b"".join(_ld(1, i.encode()) for i in inputs)
    out += b"".join(_ld(2, o.encode()) for o in outputs)
    out += _ld(4, op_type.encode())
    out += b"".join(_ld(5, _attr(k, v)) for k, v in attrs.items())
    return out


def make_model(nodes: list[bytes], initializers: list[bytes],
               inputs: list[str], outputs: list[str],
               name: str = "g") -> bytes:
    graph = b"".join(_ld(1, n) for n in nodes)
    graph += _ld(2, name.encode())
    graph += b"".join(_ld(5, t) for t in initializers)
    graph += b"".join(_ld(11, _ld(1, i.encode())) for i in inputs)
    graph += b"".join(_ld(12, _ld(1, o.encode())) for o in outputs)
    # ir_version 8, opset {domain "", version 17} — onnxruntime-loadable
    model = _vi(1, 8)
    model += _ld(8, _ld(1, b"") + _vi(2, 17))
    model += _ld(7, graph)
    return model
