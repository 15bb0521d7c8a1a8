#!/usr/bin/env python
"""Parse a jax.profiler xplane.pb trace WITHOUT tensorflow and print the
device-op time breakdown.

The image's tensorboard_plugin_profile cannot convert xspace files (its
native pywrap converter is missing from the TF stub), so this decodes
the protobuf wire format directly with the stable XPlane field numbers
(tensorflow/core/profiler/protobuf/xplane.proto):

    XSpace.planes = 1
    XPlane: id=1 name=2 lines=3 event_metadata=4(map: key=1, value=2)
    XLine:  id=1 name=2 timestamp_ns=3 events=4
    XEvent: metadata_id=1 offset_ps=2 duration_ps=3
    XEventMetadata: id=1 name=2 display_name=4

Usage: python tools/xplane_report.py /tmp/trace_out [top_n]
Aggregates total duration per op name on the TPU device planes and
groups ops by a coarse stage classifier for a step-composition view.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf, start=0, end=None):
    """Yield (field_number, wire_type, value) over a message's bytes."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    name = ""
    meta = {}
    meta_stats = {}  # metadata_id -> [XStat bytes]
    stat_names = {}  # stat metadata id -> name
    lines = []
    for fnum, wt, val in _fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:  # event_metadata map entry
            mid, mname, mdisp, stats = 0, "", "", []
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
                        elif f3 == 4 and w3 == 2:
                            mdisp = v3.decode("utf-8", "replace")
                        elif f3 == 5 and w3 == 2:
                            stats.append(v3)
            meta[mid] = mdisp or mname
            meta_stats[mid] = stats
        elif fnum == 5 and wt == 2:  # stat_metadata map entry
            sid, sname = 0, ""
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    sid = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 2 and w3 == 2:
                            sname = v3.decode("utf-8", "replace")
            stat_names[sid] = sname
        elif fnum == 3 and wt == 2:
            lines.append(val)
    return name, meta, lines, meta_stats, stat_names


def parse_stat(buf, stat_names):
    sid, sval = 0, None
    for f, w, v in _fields(buf):
        if f == 1 and w == 0:
            sid = v
        elif f == 5 and w == 2:
            sval = v.decode("utf-8", "replace")
        elif f == 6 and w == 2:
            sval = v.decode("utf-8", "replace")
        elif f in (3, 4) and w == 0:
            sval = v
    return stat_names.get(sid, f"#{sid}"), sval


def parse_line_events(buf):
    """-> (line_name, [(metadata_id, duration_ps)])"""
    lname = ""
    events = []
    for fnum, wt, val in _fields(buf):
        if fnum == 2 and wt == 2:
            lname = val.decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:  # XEvent
            mid = dur = 0
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 3 and w2 == 0:
                    dur = v2
            events.append((mid, dur))
    return lname, events


STAGES = [
    ("pallas fwd", re.compile(r"forward_kernel|_forward_kernel")),
    ("pallas bwd", re.compile(r"backward_kernel|_backward_kernel")),
    ("sort (binning)", re.compile(r"sort", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("gather", re.compile(r"gather", re.I)),
    ("conv (ssim)", re.compile(r"conv", re.I)),
    ("matmul (mlp/sh)", re.compile(r"dot|fusion.*dot", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
]


def classify(name):
    for stage, pat in STAGES:
        if pat.search(name):
            return stage
    return "other"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_out"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {root}")
    # per (line name) -> Counter(op name -> duration)
    lines_ops = collections.defaultdict(collections.Counter)
    op_detail = {}
    for p in paths:
        buf = open(p, "rb").read()
        for fnum, wt, val in _fields(buf):
            if fnum != 1 or wt != 2:
                continue
            pname, meta, lines, meta_stats, stat_names = parse_plane(val)
            if not pname.startswith("/device:TPU"):
                continue
            for lb in lines:
                lname, events = parse_line_events(lb)
                for mid, dur in events:
                    name = meta.get(mid, f"#{mid}")
                    lines_ops[lname][name] += dur
                    if name not in op_detail and mid in meta_stats:
                        det = {}
                        for sb in meta_stats[mid]:
                            k, v = parse_stat(sb, stat_names)
                            det[k] = v
                        op_detail[name] = det
    for lname, ops in sorted(lines_ops.items(),
                             key=lambda kv: -sum(kv[1].values())):
        total = sum(ops.values())
        print(f"\n==== line '{lname}': {total / 1e9:.1f} ms total ====")
        if lname not in ("XLA Ops", "Async XLA Ops"):
            continue
        for name, dur in ops.most_common(top_n):
            det = op_detail.get(name, {})
            src = str(det.get("tf_op", det.get("long_name", "")))[:70]
            cat = det.get("hlo_category", "")
            print(f"{dur / 1e9:10.3f} ms  {name[:40]:42s} {cat} {src}")


if __name__ == "__main__":
    main()
