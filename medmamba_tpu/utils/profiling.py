"""Profiling / FLOP-accounting utilities (SURVEY §5 tracing subsystem).

The reference's only profiling aid is the analytic selective-scan FLOP counter
(MedMamba.py:18-50) plus tqdm step bars. Here:
  * ``model_flops_report`` reproduces the analytic accounting for a whole VSSM
    (per-stage SS2D + conv-branch + projection MACs);
  * ``trace`` wraps a code region in a ``jax.profiler`` trace for XProf/
    TensorBoard inspection;
  * the trainer logs images/sec per epoch (the north-star metric).
"""
from __future__ import annotations

import contextlib
import math
from typing import Dict

from medmamba_tpu.ops.flops import flops_selective_scan, flops_ss2d


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def model_flops_report(depths, dims, image_size: int = 224,
                       d_state: int = 16, num_classes: int = 1000) -> Dict:
    """Analytic MACs per image for a VSSM config (forward pass)."""
    h = w = image_size // 4
    total = 0.0
    per_stage = []
    # patch embed: conv 4x4 s4, 3 -> dims[0]
    total += (image_size // 4) ** 2 * dims[0] * 3 * 16
    for i, (depth, dim) in enumerate(zip(depths, dims)):
        stage = 0.0
        half = dim // 2
        for _ in range(depth):
            stage += flops_ss2d(h, w, half, d_state)
            # conv branch: 2x conv3x3 + conv1x1 on half channels
            stage += h * w * (half * half * 9 * 2 + half * half)
        if i < len(depths) - 1:
            stage += (h // 2) * (w // 2) * (4 * dim) * (2 * dim)  # merging
            h, w = h // 2, w // 2
        per_stage.append(stage)
        total += stage
    total += dims[-1] * num_classes
    return {"total_macs": total, "per_stage_macs": per_stage,
            "scan_macs_stage0": flops_selective_scan(
                1, (image_size // 4) ** 2, 4 * dims[0], d_state)}
