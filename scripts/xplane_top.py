"""Minimal xplane.pb parser: top device ops by total duration (dev).

Usage: python scripts/xplane_top.py /tmp/prof_dir [top_n]
"""

import glob
import os
import sys
from collections import defaultdict


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    files = glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                      recursive=True)
    f = max(files, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, str(ev.metadata_id))
                agg[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
        total = sum(agg.values())
        print(f"== plane {plane.name}: {len(agg)} op names, "
              f"total {total:.1f} ms (3 fwd calls)")
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:9.3f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
