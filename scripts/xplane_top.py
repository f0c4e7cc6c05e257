"""Minimal xplane.pb reader: top XLA ops by device self-time.

The image's tensorboard_plugin_profile converter is broken (pywrap mismatch),
so this parses the protobuf wire format directly (schema:
tensorflow/profiler/protobuf/xplane.proto — XSpace.planes=1; XPlane: name=2,
lines=3, event_metadata=4; XLine: events=4; XEvent: metadata_id=1,
duration_ps=3; XEventMetadata map entry: key=1, value=2{id=1, name=2}).

Usage: python scripts/xplane_top.py /tmp/dss_profile [N]
"""
import glob
import struct
import sys
from collections import defaultdict


def varint(buf, i):
    x, s = 0, 0
    while True:
        b = buf[i]
        x |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    ev_names = {}
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode()
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:  # map<int64, XEventMetadata>
            key, meta = None, None
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    meta = v2
            if meta is not None:
                mname = ""
                for f3, w3, v3 in fields(meta):
                    if f3 == 2 and w3 == 2:
                        mname = v3.decode()
                ev_names[key] = mname
    return name, lines, ev_names


def top_ops(logdir, n=40):
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    buf = open(sorted(paths)[-1], "rb").read()
    totals = defaultdict(float)
    counts = defaultdict(int)
    for fno, wt, v in fields(buf):
        if fno != 1 or wt != 2:
            continue
        pname, lines, ev_names = parse_plane(v)
        if "TPU" not in pname and "Device" not in pname:
            continue
        for line in lines:
            for f2, w2, v2 in fields(line):
                if f2 != 4 or w2 != 2:
                    continue
                mid, dur = 0, 0
                for f3, w3, v3 in fields(v2):
                    if f3 == 1 and w3 == 0:
                        mid = v3
                    elif f3 == 3 and w3 == 0:
                        dur = v3
                totals[ev_names.get(mid, str(mid))] += dur / 1e9  # ms
                counts[ev_names.get(mid, str(mid))] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    total = sum(totals.values())
    print(f"total device time: {total:.1f} ms")
    print(f"{'ms':>10} {'%':>5} {'count':>6}  op")
    for name, ms in rows[:n]:
        print(f"{ms:10.2f} {ms/total*100:5.1f} {counts[name]:6d}  {name[:150]}")
    return rows


if __name__ == "__main__":
    top_ops(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dss_profile",
            int(sys.argv[2]) if len(sys.argv) > 2 else 40)
