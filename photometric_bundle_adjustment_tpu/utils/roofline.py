"""Roofline / MFU accounting for the flagship kernels.

The reference has no performance tooling at all (SURVEY §5); the build's
north star is "kernels at speed-of-light per chip" (BASELINE.json), which
is only auditable with a FLOP and byte count per kernel.  XLA's
post-optimization ``cost_analysis`` on the compiled executable supplies
both (model-level flops; bytes accessed across fused ops), and dividing by
the measured steady-state seconds-per-call yields achieved TFLOP/s and
GB/s against the chip's peaks.

TPU v5e (1 chip) peaks used here:
  * MXU:  197 TFLOP/s bf16 (f32 matmuls run as 3-pass bf16 under
    ``default_matmul_precision("float32")``, so ~65 TFLOP/s is the
    effective f32-equivalent ceiling),
  * HBM:  819 GB/s.
The "bound" label names the resource with the higher utilisation — the
one that must improve for the kernel to go faster.
"""

from __future__ import annotations

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9


def xla_cost(compiled) -> dict:
    """(flops, bytes) from a compiled executable's cost analysis."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def jit_cost(fn, *args, **kwargs) -> dict:
    """Cost of one call of ``fn(*args)`` (compiles via the persistent
    cache; returns {'flops', 'bytes'})."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    return xla_cost(jitted.lower(*args, **kwargs).compile())


def roofline(dt_seconds: float, flops: float, bytes_: float) -> dict:
    """Achieved rates + fraction of v5e peaks + binding resource.

    ``bytes_`` comes from XLA's cost model, which counts each op's
    LOGICAL operand bytes before fusion — an upper bound on physical HBM
    traffic.  A logical-bytes rate above the HBM peak therefore means
    fusion keeps most of that traffic on-chip (VMEM/registers), and the
    kernel is latency/issue-bound rather than HBM-bound; the ``bound``
    label says so explicitly instead of reporting an impossible >100%
    HBM utilisation as a bandwidth bound.
    """
    tflops = flops / dt_seconds / 1e12
    gbps = bytes_ / dt_seconds / 1e9
    mxu = flops / dt_seconds / V5E_PEAK_BF16_FLOPS
    hbm = bytes_ / dt_seconds / V5E_PEAK_HBM_BPS
    if hbm > 1.0:
        bound = "on-chip (fused); latency/issue"
    elif mxu < 0.02 and hbm < 0.02:
        bound = "latency/overhead"
    else:
        bound = "mxu" if mxu >= hbm else "hbm"
    return {
        "tflops": round(tflops, 2),
        "logical_gbps": round(gbps, 1),
        "pct_mxu_bf16_peak": round(100 * mxu, 1),
        "pct_hbm_peak_logical": round(100 * hbm, 1),
        "bound": bound,
    }
