"""Minimal xplane.pb reader: hand-rolled protobuf wire decoder for the
XSpace/XPlane schema (tensorflow/core/profiler/protobuf/xplane.proto) — no
tensorflow dependency. Prints per-op total device time.

Usage: python scripts/xplane_dump.py <file.xplane.pb> [--steps N] [--top K]
"""

from __future__ import annotations

import argparse
import struct
from collections import defaultdict


def _varint(buf: memoryview, i: int):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_event(buf):
    md, dur = 0, 0
    for fn, wt, v in fields(buf):
        if fn == 1:
            md = v
        elif fn == 3:
            dur = v
    return md, dur


def parse_line(buf):
    name = ""
    events = []
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = bytes(v).decode(errors="replace")
        elif fn == 4:
            events.append(parse_event(v))
    return name, events


def parse_kv_eventmeta(buf):
    """map<int64, XEventMetadata> entry -> (id, name)."""
    k, name = 0, ""
    for fn, wt, v in fields(buf):
        if fn == 1:
            k = v
        elif fn == 2:  # XEventMetadata
            for fn2, wt2, v2 in fields(v):
                if fn2 == 2:
                    name = bytes(v2).decode(errors="replace")
    return k, name


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = bytes(v).decode(errors="replace")
        elif fn == 3:
            lines.append(parse_line(v))
        elif fn == 4:
            k, nm = parse_kv_eventmeta(v)
            meta[k] = nm
    return name, lines, meta


def parse_space(data: bytes):
    planes = []
    for fn, wt, v in fields(memoryview(data)):
        if fn == 1:
            planes.append(parse_plane(v))
    return planes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--plane", default=None, help="substring filter on plane name")
    ap.add_argument("--line", default=None, help="substring filter on line name")
    ap.add_argument("--lines", action="store_true", help="list line names + totals only")
    args = ap.parse_args()

    with open(args.path, "rb") as f:
        planes = parse_space(f.read())

    print("planes:")
    for name, lines, meta in planes:
        tot_events = sum(len(e) for _, e in lines)
        print(f"  {name!r}: {len(lines)} lines, {tot_events} events")

    for name, lines, meta in planes:
        if args.plane and args.plane not in name:
            continue
        if args.plane is None and not (
            "TPU" in name or "/device" in name.lower() or "Device" in name
        ):
            continue
        if args.lines:
            print(f"\n== plane {name!r}: lines")
            for lname, events in lines:
                tot = sum(d for _, d in events) / 1e9
                print(f"  {lname!r}: {len(events)} events, {tot/args.steps:.3f} ms/step total")
            continue
        totals = defaultdict(float)
        counts = defaultdict(int)
        for lname, events in lines:
            if args.line and args.line not in lname:
                continue
            for md, dur in events:
                nm = meta.get(md, f"#{md}")
                totals[nm] += dur / 1e9  # ps -> ms
                counts[nm] += 1
        print(f"\n== plane {name!r}: top {args.top} ops by total ms/step")
        for nm, ms in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"{ms/args.steps:9.4f} ms/step x{counts[nm]//args.steps:<5d} {nm[:150]}")


if __name__ == "__main__":
    main()
