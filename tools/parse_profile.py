import sys
from xprof.convert import raw_to_tool_data as rtd
path = sys.argv[1]
tool = sys.argv[2] if len(sys.argv) > 2 else "framework_op_stats"
params = {"tqx": "out:csv;"}
data, mime = rtd.xspace_to_tool_data([path], tool, params)
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/tool_out.csv"
if isinstance(data, bytes):
    open(out, "wb").write(data)
else:
    open(out, "w").write(str(data))
print("wrote", out, mime)

# Usage (hard-won; see project memory tpu-kernel-findings):
#   python -m jax.profiler / jax.profiler.start_trace(dir) during bench steps,
#   then: python tools/parse_profile.py <dir>/plugins/profile/<run>/*.xplane.pb \
#            framework_op_stats /tmp/ops.csv
#   Other useful tools: "op_profile", "trace_viewer@" (json). Pallas kernel
#   self-time appears under the op-name path; "while" self-time ~= inter-op
#   dispatch gaps at ~80 launches/step.
