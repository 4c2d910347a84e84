"""Parse a jax.profiler xplane trace and print per-opcode and top-event
device-time tables (tensorboard_plugin_profile's converter is broken on
this image; this reads the XSpace proto directly).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python benchmarks/parse_trace.py /tmp/trace_dir [n_steps]
"""

import glob
import re
import sys


def main():
    out_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    paths = glob.glob(f"{out_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise SystemExit(f"no xplane under {out_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "TPU" in p.name)
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    line = max(plane.lines, key=lambda l: len(l.events))

    op_rx = re.compile(r"=\s+[^ ]+\s+([a-z][\w-]*)\(")
    by_op, by_event = {}, {}
    for ev in line.events:
        name = ev_meta.get(ev.metadata_id, "?")
        m = op_rx.search(name)
        cat = m.group(1) if m else name.split(".")[0].lstrip("%")
        by_op[cat] = by_op.get(cat, 0) + ev.duration_ps
        by_event[name] = by_event.get(name, 0) + ev.duration_ps

    allt = sum(by_op.values())
    print(f"device line '{line.name}': {allt / 1e9:.1f} ms total, "
          f"{allt / n_steps / 1e9:.1f} ms/step attributed\n")
    print("== by opcode ==")
    for n, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {t / n_steps / 1e9:8.2f} ms/step {100 * t / allt:5.1f}%  {n}")
    print("\n== top events ==")
    for n, t in sorted(by_event.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {t / n_steps / 1e9:7.2f} ms/step  {n[:140]}")


if __name__ == "__main__":
    main()
