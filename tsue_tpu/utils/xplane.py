"""Self-contained xplane trace reader: per-op device-time aggregation.

``utils.logging.profile_trace`` (SURVEY §5 tracing) writes an
``*.xplane.pb`` per session, but this image ships no xplane protobuf
bindings (tensorboard_plugin_profile lacks ``xplane_pb2``), so traces
were previously view-only.  This module decodes the protobuf wire format
directly (the XSpace schema is stable: planes -> lines -> events with
metadata-id -> name tables) and aggregates event durations — enough to
answer "where does device time go" without TensorBoard.

Used by ``scripts/profile_ops.py``; the r3 decode-step profile in
PARITY.md was produced with it.
"""
from __future__ import annotations

import collections
import re
import struct
from typing import Dict, Iterable, List, Tuple

# protobuf wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    r = s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def parse_message(buf: bytes) -> List[Tuple[int, int, object]]:
    """Decode one message into (field_number, wire_type, value) triples."""
    out = []
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        f, w = key >> 3, key & 7
        if w == _VARINT:
            v, i = _varint(buf, i)
        elif w == _LEN:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif w == _I32:
            v = struct.unpack("<I", buf[i:i + 4])[0]
            i += 4
        elif w == _I64:
            v = struct.unpack("<Q", buf[i:i + 8])[0]
            i += 8
        else:  # pragma: no cover - groups don't appear in xplane
            raise ValueError(f"unsupported wire type {w}")
        out.append((f, w, v))
    return out


def _first(fields, num, wire, default=None):
    return next((v for f, w, v in fields if f == num and w == wire), default)


# XPlane field numbers (tensorflow/core/profiler/protobuf/xplane.proto)
_SPACE_PLANES = 1
_PLANE_NAME, _PLANE_LINES, _PLANE_EVENT_META = 2, 3, 4
_LINE_NAME, _LINE_EVENTS, _LINE_DISPLAY = 2, 4, 11
_EVENT_META_ID, _EVENT_DUR_PS = 1, 3
_META_NAME = 2

# wrapper HLO opcodes that nest real work (their durations double-count)
_WRAPPERS = frozenset({"while", "conditional", "call", "tuple", "body",
                       "condition", "get-tuple-element"})


def op_durations(path: str, plane_filter: str = "TPU",
                 line_filter: str = "XLA Ops") -> Dict[str, dict]:
    """Aggregate event durations from an ``*.xplane.pb``.

    Returns {op_name: {"ps": total_picoseconds, "count": n, "kind":
    opcode}} for leaf events on matching planes/lines (wrapper opcodes
    like while/call are dropped — their spans double-count children).
    """
    space = parse_message(open(path, "rb").read())
    agg: Dict[str, dict] = {}
    for f, w, plane_buf in space:
        if f != _SPACE_PLANES or w != _LEN:
            continue
        plane = parse_message(plane_buf)
        pname = (_first(plane, _PLANE_NAME, _LEN, b"?")).decode()
        if plane_filter not in pname:
            continue
        meta = {}
        for ff, ww, v in plane:
            if ff == _PLANE_EVENT_META and ww == _LEN:
                ent = parse_message(v)
                k = _first(ent, 1, _VARINT)
                m = _first(ent, 2, _LEN)
                if m is not None:
                    nm = _first(parse_message(m), _META_NAME, _LEN, b"?")
                    meta[k] = nm.decode()
        for ff, ww, v in plane:
            if ff != _PLANE_LINES or ww != _LEN:
                continue
            line = parse_message(v)
            lname = (_first(line, _LINE_DISPLAY, _LEN)
                     or _first(line, _LINE_NAME, _LEN, b"?")).decode()
            if line_filter and line_filter != lname:
                continue
            for a, b, ev in line:
                if a != _LINE_EVENTS or b != _LEN:
                    continue
                e = parse_message(ev)
                nm = meta.get(_first(e, _EVENT_META_ID, _VARINT), "?")
                dur = _first(e, _EVENT_DUR_PS, _VARINT, 0)
                kind = _opcode(nm)
                if kind in _WRAPPERS:
                    continue
                short = nm.split(" = ")[0]
                rec = agg.setdefault(short, {"ps": 0, "count": 0,
                                             "kind": kind})
                rec["ps"] += dur
                rec["count"] += 1
    return agg


def _opcode(hlo_name: str) -> str:
    m = re.match(r"%([a-zA-Z][\w-]*?)[.\s]", hlo_name)
    return m.group(1) if m else hlo_name[:24]


def summarize(agg: Dict[str, dict], top: int = 20) -> str:
    """Human-readable table: totals per opcode kind + top individual ops."""
    by_kind = collections.Counter()
    cnt = collections.Counter()
    for rec in agg.values():
        by_kind[rec["kind"]] += rec["ps"]
        cnt[rec["kind"]] += rec["count"]
    lines = [f"total leaf device time: {sum(by_kind.values())/1e9:.2f} ms",
             "", "by opcode:"]
    for k, ps in by_kind.most_common(top):
        lines.append(f"  {ps/1e9:9.2f} ms  {cnt[k]:7d}x  {k}")
    lines += ["", "top individual ops:"]
    top_ops = sorted(agg.items(), key=lambda kv: -kv[1]["ps"])[:top]
    for name, rec in top_ops:
        lines.append(f"  {rec['ps']/1e9:9.2f} ms  {rec['count']:7d}x  "
                     f"{name} :: {rec['kind']}")
    return "\n".join(lines)


def find_xplane(trace_dir: str) -> str:
    """Locate the newest ``*.xplane.pb`` under a profile_trace out_dir."""
    import glob
    import os
    cands = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not cands:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    return max(cands, key=os.path.getmtime)
