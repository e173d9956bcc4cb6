import os

from .fused_trunk import fused_trunk_available, fused_trunk_forward


def force_interpret():
    """Test hook: TEXPOSE_FUSED_INTERPRET=1 routes the fused kernel paths in
    pallas interpreter mode on any backend, so the fused-vs-plain render
    equivalence is testable on the CPU mesh."""
    return os.environ.get("TEXPOSE_FUSED_INTERPRET") == "1"
