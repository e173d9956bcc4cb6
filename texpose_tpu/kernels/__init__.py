from .fused_trunk import fused_trunk_available, fused_trunk_forward
