"""Summarize an XLA device trace (as captured by observe.ProfileWindow /
ANODDPM_PROFILE_DIR) into per-op-category time shares.

Works directly off the trace.json.gz Chrome-trace export (the richer
xplane.pb needs tensorboard_plugin_profile, which is version-broken against
this image's TF), aggregating leaf TPU ops by HLO name prefix.

Usage: python scripts/trace_categories.py <profile_dir> [steps_in_trace]
"""
import collections
import glob
import gzip
import json
import re
import sys


def main():
    root = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else None
    paths = sorted(glob.glob(f"{root}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)

    dev_pids = {e["pid"] for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    events = [e for e in data["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") in dev_pids]
    agg = collections.Counter()
    for e in events:
        name = e["name"]
        if (name.startswith("while") or name.startswith("jit_")
                or name.isdigit()):
            continue  # wrappers/step-markers double-count their children
        agg[re.sub(r"[.\d]+$", "", name)] += e.get("dur", 0)
    total = sum(agg.values())
    per_step = f" ({total / steps / 1e3:.1f} ms/step)" if steps else ""
    print(f"device leaf-op total: {total / 1e6:.3f} s{per_step}  [{paths[-1]}]")
    for name, dur in agg.most_common(20):
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
