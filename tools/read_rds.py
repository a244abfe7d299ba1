#!/usr/bin/env python3
"""Minimal RDS (R serialization, XDR v2/v3) reader — just enough to
extract the reference's golden data.frame artifacts (character/numeric
columns) for fixture generation. Usage:

    python3 tools/read_rds.py <file.rds> [out.json]

Prints a JSON object {columns: [...], data: {col: [values...]}} where R
NA becomes null. Only the SEXP types the hi-csa-db artifacts use are
implemented (VECSXP, STRSXP, CHARSXP, INTSXP, REALSXP, LGLSXP, LISTSXP
attribute pairlists, SYMSXP + reference table).
"""
import gzip
import json
import struct
import sys


class R:
    def __init__(self, data: bytes):
        self.d = data
        self.o = 0
        self.refs = []

    def u4(self):
        v = struct.unpack_from(">i", self.d, self.o)[0]
        self.o += 4
        return v

    def f8(self):
        v = struct.unpack_from(">d", self.d, self.o)[0]
        self.o += 8
        return v

    def raw(self, n):
        v = self.d[self.o:self.o + n]
        self.o += n
        return v

    def item(self):
        flags = self.u4()
        t = flags & 0xFF
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)
        if t == 0xFF:  # reference
            idx = flags >> 8
            return self.refs[idx - 1]
        if t == 0xFE:  # NILVALUE
            return None
        if t == 1:  # SYMSXP
            sym = self.item()
            self.refs.append(sym)
            return sym
        if t == 2:  # LISTSXP (pairlist)
            attr = self.item() if has_attr else None
            tag = self.item() if has_tag else None
            car = self.item()
            cdr = self.item()
            return ("pairlist", tag, car, cdr, attr)
        if t == 9:  # CHARSXP
            n = self.u4()
            if n == -1:
                return None
            return self.raw(n).decode("utf-8")
        if t == 10:  # LGLSXP
            n = self.u4()
            return self._with_attr([self._lgl() for _ in range(n)], has_attr)
        if t == 13:  # INTSXP
            n = self.u4()
            vals = [self.u4() for _ in range(n)]
            vals = [None if v == -2147483648 else v for v in vals]
            return self._with_attr(vals, has_attr)
        if t == 14:  # REALSXP
            n = self.u4()
            vals = [self.f8() for _ in range(n)]
            return self._with_attr(vals, has_attr)
        if t == 16:  # STRSXP
            n = self.u4()
            vals = [self.item() for _ in range(n)]
            return self._with_attr(vals, has_attr)
        if t == 19:  # VECSXP (generic list)
            n = self.u4()
            vals = [self.item() for _ in range(n)]
            return self._with_attr(vals, has_attr)
        raise ValueError(f"unhandled SEXP type {t} at offset {self.o}")

    def _lgl(self):
        v = self.u4()
        return None if v == -2147483648 else bool(v)

    def _with_attr(self, vals, has_attr):
        if not has_attr:
            return vals
        attr = self.item()
        attrs = {}
        node = attr
        while isinstance(node, tuple) and node[0] == "pairlist":
            _, tag, car, cdr, _ = node
            attrs[tag] = car
            node = cdr
        return {"values": vals, "attrs": attrs}


def read_rds(path):
    raw = open(path, "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    r = R(raw)
    assert r.raw(2) == b"X\n", "not XDR serialization"
    version = r.u4()
    r.u4()  # writer version
    r.u4()  # min reader version
    if version >= 3:
        n = r.u4()
        r.raw(n)  # native encoding
    return r.item()


def frame_to_json(obj):
    attrs = obj["attrs"]
    names = attrs.get("names")
    cols = names["values"] if isinstance(names, dict) else names
    data = {}
    for name, colv in zip(cols, obj["values"]):
        vals = colv["values"] if isinstance(colv, dict) else colv
        data[name] = vals
    return {"columns": cols, "data": data,
            "nrows": len(next(iter(data.values()))) if data else 0}


if __name__ == "__main__":
    obj = read_rds(sys.argv[1])
    out = frame_to_json(obj) if isinstance(obj, dict) and "attrs" in obj and \
        "names" in obj["attrs"] else obj
    text = json.dumps(out, indent=None, ensure_ascii=False)
    if len(sys.argv) > 2:
        open(sys.argv[2], "w").write(text)
        print(f"wrote {sys.argv[2]}")
    else:
        print(text)
