"""TPU-native ops: selective scan (Pallas/XLA), CrossScan/CrossMerge, FLOPs."""

from medmamba_tpu.ops.cross_scan import (  # noqa: F401
    cross_merge, cross_merge_fr, cross_scan, cross_scan_fwd)
from medmamba_tpu.ops.flops import flops_selective_scan, flops_ss2d  # noqa: F401
from medmamba_tpu.ops.selective_scan import (  # noqa: F401
    selective_scan, selective_scan_assoc, selective_scan_seq)
