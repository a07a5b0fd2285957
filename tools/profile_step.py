"""Capture an xprof trace of the production train step and print top ops.

Drives the same jitted step as bench.py (donated state, on-device augment),
captures steps 3-5 with jax.profiler, converts the xplane to the
framework_op_stats table, and prints the top-N ops by self time plus the
scan/non-scan split implied by the op names. This is the measurement tool
behind the non-scan diet (VERDICT r2 #4): attack the biggest real op, not a
guess.

Usage (on the TPU host):
    python tools/profile_step.py [--model T] [--batch 64] [--top 25]
                                 [--stub]   # scan replaced by shape-correct no-op
Writes the raw CSV next to the trace dir and prints a compact table.
"""
from __future__ import annotations

import argparse
import glob
import io
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="T")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--stub", action="store_true",
                    help="profile the scan-stubbed step (non-scan floor)")
    ap.add_argument("--trace_dir", default="/tmp/step_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from medmamba_tpu.models.registry import create_model
    from medmamba_tpu.parallel.mesh import (make_mesh, replicate_state,
                                            shard_batch)
    from medmamba_tpu.train.trainer import (init_state, make_optimizer,
                                            train_step)

    model = create_model(args.model, num_classes=9, dtype=jnp.bfloat16,
                         scan_impl="stub" if args.stub else "auto")
    state = init_state(model, jax.random.key(0),
                       make_optimizer(1e-3, npz_mode=True))
    mesh = make_mesh()
    state = replicate_state(state, mesh)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (args.batch, 224, 224, 3), dtype=np.uint8)
    labels = rng.integers(0, 9, (args.batch,), dtype=np.int64)
    images, labels = shard_batch(mesh, images, labels)
    key = jax.random.key(1)

    import functools

    @functools.partial(jax.jit, donate_argnames=("s",))
    def step(s):
        return train_step(s, images, labels, key, augment=True)

    for _ in range(3):  # compile + warm
        state, loss = step(state)
    float(loss)

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(3):
        state, loss = step(state)
    float(loss)
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(
        f"{args.trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        sys.exit(1)
    from xprof.convert import raw_to_tool_data as rtd

    data, _mime = rtd.xspace_to_tool_data([xplanes[-1]], "framework_op_stats",
                                          {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    csv_path = f"{args.trace_dir}/op_stats.csv"
    with open(csv_path, "w") as f:
        f.write(data)

    import csv as _csv
    import json as _json

    body = data.lstrip()
    if body.startswith("google.visualization"):
        # the gviz JSONP transport: google.visualization.Query.setResponse(
        # {...}); -- unwrap to the inner JSON table
        body = body[body.index("(") + 1:body.rindex(")")]
    if body.startswith("[{") or body.startswith("{"):
        # xprof >= 2.x returns the gviz-JSON table regardless of tqx=out:csv
        tab = _json.loads(body)
        tab = tab[0] if isinstance(tab, list) else tab
        if "table" in tab:  # setResponse payload nests it under 'table'
            tab = tab["table"]
        ids = [c["id"] for c in tab["cols"]]
        rows = [{ids[i]: (cell or {}).get("v") for i, cell in
                 enumerate(r["c"])} for r in tab["rows"]]
    else:
        rows = list(_csv.DictReader(io.StringIO(data)))
    device = [r for r in rows
              if str(r.get("Host/device", r.get("host_or_device",
                                                ""))).lower() != "host"]
    if not device:
        # an unrecognized table form must fail loudly, not print a silently
        # wrong "0.00 ms" report
        print(f"no device rows parsed from the op-stats table ({csv_path})",
              file=sys.stderr)
        sys.exit(1)

    def col(r, *names, default="0"):
        for n in names:
            if n in r and r[n] not in ("", None):
                return r[n]
        return default

    for r in device:
        r["_self_us"] = float(col(r, "Total self-time (us)",
                                  "total_self_time", "total_self_time_us",
                                  "Self time (us)"))
    device.sort(key=lambda r: -r["_self_us"])
    total = sum(r["_self_us"] for r in device)
    def opname(r):
        return str(col(r, "Operation", "Operation Name", "operation",
                       "op_name", default="?"))

    scan = sum(r["_self_us"] for r in device
               if "scan" in opname(r).lower()
               or "pallas" in opname(r).lower())
    n_steps = 3.0
    print(f"total device self-time/step: {total / n_steps / 1e3:.2f} ms  "
          f"(pallas/scan-named: {scan / n_steps / 1e3:.2f} ms)")
    print(f"{'self ms/step':>12}  {'%':>5}  op")
    for r in device[:args.top]:
        print(f"{r['_self_us'] / n_steps / 1e3:12.3f}  "
              f"{100 * r['_self_us'] / max(total, 1e-9):5.1f}  "
              f"{opname(r)[:100]}")
    print(f"\nraw table: {csv_path}")


if __name__ == "__main__":
    main()
