"""Shared Mosaic compiler-params builder for the fused kernels.

Mosaic's default scoped-VMEM budget is 16 MB; a v5e core has 128 MB of
VMEM.  Every r2/r3 tile A/B (streams >2048 rows, fwd tile 1024, bwd
subtiles 4) died on "scoped vmem limit exceeded" — the kernels were being
sized to a quarter of the hardware.  `vmem_limit_bytes` raises the budget
per kernel; TEXPOSE_VMEM_LIMIT_MB (or cfg.kernels.vmem_limit_mb via the
callers) controls it.  Raising the budget trades pipeline double-buffer
headroom for bigger compute tiles, so the right value is an A/B question,
not "as high as possible".
"""

import os

from jax.experimental.pallas import tpu as pltpu

# process-wide cfg override (cfg.kernels.vmem_limit_mb), set once at engine
# init via set_vmem_limit_mb() so the active budget is recorded in the
# options.yaml snapshot; env remains the knob for standalone tools
_CFG_LIMIT_MB = None


def set_vmem_limit_mb(mb):
    global _CFG_LIMIT_MB
    _CFG_LIMIT_MB = mb


def vmem_limit_bytes(vmem_limit_mb=None):
    """Resolve the scoped-VMEM budget: explicit arg → cfg → env → None
    (Mosaic default, 16M)."""
    if vmem_limit_mb is None:
        vmem_limit_mb = _CFG_LIMIT_MB
    if vmem_limit_mb is None:
        vmem_limit_mb = os.environ.get("TEXPOSE_VMEM_LIMIT_MB") or None
    if vmem_limit_mb in (None, "", "0"):
        return None
    return int(float(vmem_limit_mb) * (1 << 20))


def compiler_params(interpret, parallel=False, vmem_limit_mb=None):
    """CompilerParams for a production Mosaic compile (None in interpret
    mode — the interpreter rejects TPU-only params)."""
    if interpret:
        return None
    kw = {}
    if parallel:
        kw["dimension_semantics"] = ("parallel",)
    lim = vmem_limit_bytes(vmem_limit_mb)
    if lim is not None:
        kw["vmem_limit_bytes"] = lim
    return pltpu.CompilerParams(**kw) if kw else None
