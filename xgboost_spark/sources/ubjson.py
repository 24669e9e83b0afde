"""UBJSON (Universal Binary JSON, ubjson.org spec) codec.

The reference saves/loads models in either JSON or UBJSON depending on
the file extension (`XGBoosterSaveModel`/`LoadModel`,
`include/xgboost/c_api.h:1353-1389`; writer in `src/common/json.cc`
UBJWriter/UBJReader).  This is a clean-room implementation of the
public UBJSON spec — enough to read any model document the reference
produces and to write spec-compliant files back:

- all integer widths (i U I l L), float32/64 (d D), high-precision (H)
- strings (S), chars (C), null/true/false (Z T F), no-op (N)
- objects and arrays, including strongly-typed containers
  (``[$<type>`` with optional ``#<count>``) the reference emits for its
  numeric tree arrays.

Decodes to the same Python structures ``json.loads`` would produce, so
`GBDTModel.from_json`'s document handling is shared between the two
formats.
"""

from __future__ import annotations

import struct

_INT_FMT = {b"i": ("b", 1), b"U": ("B", 1), b"I": (">h", 2),
            b"l": (">i", 4), b"L": (">q", 8)}
_FLOAT_FMT = {b"d": (">f", 4), b"D": (">d", 8)}


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.p = 0

    def take(self, n: int) -> bytes:
        out = self.b[self.p:self.p + n]
        if len(out) != n:
            raise ValueError("ubjson: truncated input")
        self.p += n
        return out

    def marker(self) -> bytes:
        m = self.take(1)
        while m == b"N":          # no-op: skip
            m = self.take(1)
        return m

    def read_int(self, m: bytes) -> int:
        fmt, n = _INT_FMT[m]
        return struct.unpack(fmt, self.take(n))[0]

    def read_length(self) -> int:
        m = self.marker()
        if m not in _INT_FMT:
            raise ValueError(f"ubjson: bad length marker {m!r}")
        v = self.read_int(m)
        if v < 0:
            raise ValueError("ubjson: negative length")
        return v

    def read_string(self) -> str:
        return self.take(self.read_length()).decode("utf-8")

    def value(self, m: bytes | None = None):
        m = m or self.marker()
        if m in _INT_FMT:
            return self.read_int(m)
        if m in _FLOAT_FMT:
            fmt, n = _FLOAT_FMT[m]
            return struct.unpack(fmt, self.take(n))[0]
        if m == b"S":
            return self.read_string()
        if m == b"H":             # high-precision number as string
            s = self.take(self.read_length()).decode("utf-8")
            try:
                return int(s)
            except ValueError:
                return float(s)
        if m == b"C":
            return self.take(1).decode("latin-1")
        if m == b"T":
            return True
        if m == b"F":
            return False
        if m == b"Z":
            return None
        if m == b"[":
            return self._container(b"]", is_obj=False)
        if m == b"{":
            return self._container(b"}", is_obj=True)
        raise ValueError(f"ubjson: unknown marker {m!r}")

    def _container(self, close: bytes, is_obj: bool):
        el_type = None
        count = None
        m = self.marker()
        if m == b"$":
            el_type = self.take(1)
            m = self.marker()
            if m != b"#":
                raise ValueError("ubjson: typed container requires a count")
        if m == b"#":
            count = self.read_length()
            m = None
        out = {} if is_obj else []
        if count is not None:
            for _ in range(count):
                if is_obj:
                    k = self.read_string()
                    out[k] = self.value(el_type)
                else:
                    out.append(self.value(el_type))
            return out
        # unbounded container: m holds the first marker already
        while True:
            if m is None:
                m = self.marker()
            if m == close:
                return out
            if is_obj:
                # object keys are length-prefixed strings; m is the
                # key's length marker
                klen = self.read_int(m)
                k = self.take(klen).decode("utf-8")
                out[k] = self.value()
            else:
                out.append(self.value(m))
            m = None


def loads(data: bytes):
    """Parse one UBJSON document."""
    return _Reader(data).value()


# ---------------------------------------------------------------- writer

def _write_int(out: bytearray, v: int):
    if -(2 ** 7) <= v < 2 ** 7:
        out += b"i" + struct.pack("b", v)
    elif 0 <= v < 2 ** 8:
        out += b"U" + struct.pack("B", v)
    elif -(2 ** 15) <= v < 2 ** 15:
        out += b"I" + struct.pack(">h", v)
    elif -(2 ** 31) <= v < 2 ** 31:
        out += b"l" + struct.pack(">i", v)
    else:
        out += b"L" + struct.pack(">q", v)


def _write_str_payload(out: bytearray, s: str):
    b = s.encode("utf-8")
    _write_int(out, len(b))
    out += b


def _write_value(out: bytearray, v):
    if v is None:
        out += b"Z"
    elif v is True:
        out += b"T"
    elif v is False:
        out += b"F"
    elif isinstance(v, int):
        _write_int(out, v)
    elif isinstance(v, float):
        out += b"D" + struct.pack(">d", v)
    elif isinstance(v, str):
        out += b"S"
        _write_str_payload(out, v)
    elif isinstance(v, dict):
        out += b"{"
        for k, vv in v.items():
            _write_str_payload(out, str(k))
            _write_value(out, vv)
        out += b"}"
    elif isinstance(v, (list, tuple)):
        out += b"["
        for vv in v:
            _write_value(out, vv)
        out += b"]"
    else:
        # numpy scalars and similar duck-typed numbers
        if hasattr(v, "item"):
            return _write_value(out, v.item())
        raise TypeError(f"ubjson: cannot encode {type(v)!r}")


def dumps(doc) -> bytes:
    """Encode a JSON-style document as UBJSON."""
    out = bytearray()
    _write_value(out, doc)
    return bytes(out)
