"""Static cost analysis of the compiled step programs.

The jax profiler cannot run on the axon relay backend (see trace.py /
cli.py --profile), so alongside the device-timed phase tracing this
module extracts what the COMPILER knows about each production program:
XLA's own per-executable cost model (`Compiled.cost_analysis()`: total
FLOPs, bytes touched) and memory footprint (`memory_analysis()`:
argument/output/temp sizes — the temp size is the live-activation
high-water mark that decides whether a batch size fits HBM).

From those we derive the roofline position: arithmetic intensity
(FLOP/byte) against the machine balance point, the flop-bound and
bandwidth-bound ideal times, and — when the caller passes a measured
ms — the achieved MFU. This is the reference's missing observability
story (the reference has only wall-clock ExperimentTiming,
reference: common_blocks/callbacks.py:278-324) rebuilt on what a
TPU compiler stack actually exposes.

Peaks default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM); pass others
for different chips. All numbers are per optimized HLO module — XLA
fusion means they reflect the program that really runs, not the
source-level op list.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

# TPU v5e single chip
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def _sds_like(runner, batch_size: int):
    import jax
    import jax.numpy as jnp
    H, W = runner._img_hw
    img = jax.ShapeDtypeStruct((batch_size, H, W), jnp.uint8)
    mask = jax.ShapeDtypeStruct((batch_size, H, W), jnp.uint8)
    depth = (jax.ShapeDtypeStruct((batch_size, 1), jnp.float32)
             if runner.use_depth else None)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return img, mask, depth, rng


def analyze_program(jitted, *args) -> Dict[str, Any]:
    """Lower + compile ``jitted`` for ``args`` and return its XLA cost
    and memory analysis plus roofline-derived figures."""
    compiled = jitted.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
    except Exception:                       # backend may not expose it
        ca = {}
    if isinstance(ca, (list, tuple)):       # older jax returns [dict]
        ca = ca[0] if ca else {}
    ca = ca or {}

    class _NoMem:
        argument_size_in_bytes = output_size_in_bytes = 0
        temp_size_in_bytes = generated_code_size_in_bytes = 0

    try:
        mem = compiled.memory_analysis() or _NoMem()
    except Exception:
        mem = _NoMem()
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    intensity = flops / bytes_accessed if bytes_accessed else float("inf")
    t_flop = flops / PEAK_BF16_FLOPS
    t_bw = bytes_accessed / PEAK_HBM_BPS
    return {
        "flops": flops,
        "gflops": round(flops / 1e9, 2),
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": round(intensity, 1),
        "ideal_ms_flop_bound": round(t_flop * 1e3, 3),
        "ideal_ms_bw_bound": round(t_bw * 1e3, 3),
        "bound": "flop" if t_flop >= t_bw else "bandwidth",
        "argument_bytes": int(mem.argument_size_in_bytes),
        "output_bytes": int(mem.output_size_in_bytes),
        "temp_bytes": int(mem.temp_size_in_bytes),
        "generated_code_bytes": int(mem.generated_code_size_in_bytes),
    }


def analyze_runner(runner, batch_train: int = 0, batch_infer: int = 0,
                   state=None) -> Dict[str, Dict[str, Any]]:
    """Cost-analyze the production step programs of a
    :class:`~salt_tpu.train.steps.SegmentationRunner`.

    Returns {step_name: analysis}. Uses abstract ShapeDtypeStructs - no
    device execution happens, only trace + compile (cached afterwards
    for the real run since the shapes match the production call)."""
    cfg = runner.config
    bt = batch_train or cfg.training.batch_size_train
    bi = batch_infer or cfg.training.batch_size_inference
    if state is None:
        state = runner.init_state(cfg.execution.seed)

    img_t, mask_t, depth_t, rng = _sds_like(runner, bt)
    img_i, _, depth_i, _ = _sds_like(runner, bi)

    out: Dict[str, Dict[str, Any]] = {}
    out["train_step"] = analyze_program(
        runner.train_step, state, img_t, mask_t, depth_t, rng)
    out["predict_step"] = analyze_program(
        runner.predict_step, state.params, state.batch_stats, img_i, depth_i)
    if cfg.postpro.use_tta:
        out["predict_tta_step"] = analyze_program(
            runner.predict_tta_step, state.params, state.batch_stats,
            img_i, depth_i)
    return out


def report(analyses: Dict[str, Dict[str, Any]],
           measured_ms: Optional[Dict[str, float]] = None) -> str:
    """Human-readable roofline table; measured_ms (e.g. from
    trace_steps) adds achieved-MFU columns."""
    lines = []
    hdr = (f"{'step':<18} {'GFLOP':>9} {'GB moved':>9} {'FLOP/B':>7} "
           f"{'ideal ms':>9} {'bound':>10}")
    if measured_ms:
        hdr += f" {'meas ms':>8} {'MFU %':>6}"
    lines.append(hdr)
    for name, a in analyses.items():
        ideal = max(a["ideal_ms_flop_bound"], a["ideal_ms_bw_bound"])
        row = (f"{name:<18} {a['gflops']:>9.1f} "
               f"{a['bytes_accessed']/1e9:>9.2f} "
               f"{a['arithmetic_intensity']:>7.1f} {ideal:>9.3f} "
               f"{a['bound']:>10}")
        if measured_ms and name in measured_ms:
            ms = measured_ms[name]
            mfu = a["flops"] / (ms / 1e3) / PEAK_BF16_FLOPS * 100
            row += f" {ms:>8.2f} {mfu:>6.1f}"
        lines.append(row)
        lines.append(
            f"{'':<18} temp {a['temp_bytes']/1e6:.0f} MB, "
            f"args {a['argument_bytes']/1e6:.0f} MB, "
            f"out {a['output_bytes']/1e6:.0f} MB")
    return "\n".join(lines)
