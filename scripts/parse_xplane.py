#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace (top TPU ops by accumulated time).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python scripts/parse_xplane.py /tmp/sfh_profile

Notes: the stock tensorboard_plugin_profile converter is broken in this
image (protobuf/pywrap mismatches); this reads the XSpace proto directly
via tensorflow's tsl protos.  Async ops (copy-start/...) report their
in-flight span, which overlaps compute — treat them as context, not cost.
"""
import collections
import glob
import sys


def main(log_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{log_dir}/plugins/profile/*/*.xplane.pb")
    assert files, f"no xplane.pb under {log_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(files)[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = plane.event_metadata
        agg = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                # keep the op kind (%copy/%transpose/%fusion) AND the
                # result type so relayouts are attributable
                lhs, _, rhs = name.partition(" = ")
                kind = lhs.split(".")[0] if lhs.startswith("%") else ""
                key = (kind + " " + rhs.split("(")[0][:70]) if rhs \
                    else name[:70]
                agg[key] += ev.duration_ps
        total = sum(agg.values())
        print(f"== {plane.name} (XLA Ops line; async spans overlap) ==")
        for name, t in agg.most_common(25):
            print("  %6.2f%%  %9.2f ms  %s" % (100 * t / max(total, 1),
                                               t / 1e9, name))
        return
    print("no TPU plane found")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfh_profile")
