#!/usr/bin/env python
"""Parse a JAX xplane.pb trace and print top HLO ops by device time.

Run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the bundled
_pb2 files predate the installed C++ protobuf runtime).

Usage: parse_xplane.py <trace_dir_or_pb> [iters]
"""
import glob
import os
import sys


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if os.path.isdir(path):
        path = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                recursive=True))[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        agg = {}
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] = agg.get(name, 0) + ev.duration_ps
        print(f"== plane {plane.name} ({len(plane.lines)} lines)")
        for name, d in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
            print(f"  {d/1e9/iters:9.4f} ms/iter  {name[:120]}")


if __name__ == "__main__":
    main()
