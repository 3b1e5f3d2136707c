"""Summarise a jax.profiler trace (xplane.pb) into an op-time table.

Usage:
    NRSE_BENCH_PROFILE=/tmp/nrse_profile python bench.py
    python tools/analyze_profile.py /tmp/nrse_profile [n_steps]

Parses the XSpace proto directly (tensorflow.tsl xplane_pb2 — the
tensorboard_plugin_profile converter in this image is ABI-mismatched with
its TF build) and aggregates device-plane op events by name/category.
This is the basis for the MFU accounting in docs/round2_status.md.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def find_xplane(root: str) -> str:
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {root}")
    return max(paths, key=os.path.getmtime)


CATEGORY_RULES = [
    ("matmul (MXU)", re.compile(r"^(dot|convolution|fusion\..*gemm|cublas)")),
    ("convolution (MXU)", re.compile(r"^conv")),
    ("all-reduce/collective", re.compile(r"^(all-|reduce-scatter|collective)")),
    ("copy/transpose", re.compile(r"^(copy|transpose|bitcast|reshape)")),
    ("dynamic-update", re.compile(r"^dynamic")),
    ("custom-call", re.compile(r"^custom-call")),
]


def categorize(name: str) -> str:
    for label, rx in CATEGORY_RULES:
        if rx.match(name):
            return label
    if name.startswith(("fusion", "loop_")):
        return "fusion (VPU/mixed)"
    return "other"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nrse_profile"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else None
    xplane = find_xplane(root)
    print(f"# trace: {xplane}", file=sys.stderr)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        by_name = collections.Counter()
        calls = collections.Counter()
        total_ps = 0
        span_lo, span_hi = None, 0
        for line in plane.lines:
            # synchronous op stream only: 'Async XLA Ops' are overlapped
            # DMAs, 'Steps'/'XLA Modules' duplicate the whole span
            if line.name != "XLA Ops":
                continue
            # events nest (while/cond wrappers contain their body ops on
            # the same line) — charge each op its SELF time via an
            # interval-containment stack sweep
            evs = sorted(line.events, key=lambda e: (e.offset_ps,
                                                     -e.duration_ps))
            stack = []  # [end_ps, name, child_ps, start_ps]

            def close():
                end, name, child, start = stack.pop()
                dur = end - start
                by_name[name] += dur - child
                if stack:
                    stack[-1][2] += dur
                return dur - child

            for ev in evs:
                t0 = ev.offset_ps
                while stack and stack[-1][0] <= t0:
                    total_ps += close()
                md = ev_meta[ev.metadata_id]
                calls[md.name] += 1
                stack.append([t0 + ev.duration_ps, md.name, 0, t0])
                span_lo = t0 if span_lo is None else min(span_lo, t0)
                span_hi = max(span_hi, t0 + ev.duration_ps)
            while stack:
                total_ps += close()

        if not by_name:
            continue
        span_ms = (span_hi - (span_lo or 0)) / 1e9
        busy_ms = total_ps / 1e9
        print(f"\n## plane: {plane.name}")
        print(f"trace span {span_ms:.1f} ms; device busy {busy_ms:.1f} ms "
              f"({100 * busy_ms / max(span_ms, 1e-9):.1f}% duty)")
        if n_steps:
            print(f"≈ {busy_ms / n_steps:.1f} ms busy per step "
                  f"(over {n_steps} steps)")

        by_cat = collections.Counter()
        for name, ps in by_name.items():
            by_cat[categorize(name)] += ps
        print("\n== device time by category ==")
        for cat, ps in by_cat.most_common():
            print(f"{100 * ps / total_ps:6.2f}%  {ps / 1e9:9.2f} ms  {cat}")

        print("\n== top ops by device time ==")
        for name, ps in by_name.most_common(30):
            print(f"{100 * ps / total_ps:6.2f}%  {ps / 1e9:8.2f} ms  "
                  f"x{calls[name]:<5} {name[:110]}")


if __name__ == "__main__":
    main()
