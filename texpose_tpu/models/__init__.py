"""Training engines (the reference's model/ layer).

Engine registry replaces the reference's importlib dispatch
(train.py:18 `importlib.import_module("model."+opt.model)`).
"""

from . import losses
from . import render


def get_engine(name):
    """Engine class for a `model:` config value (lazy imports keep CLI
    startup light)."""
    if name == "nerf_pretrain":
        from .pretrain import PretrainEngine
        return PretrainEngine
    if name == "nerf_pretrain_env":
        from .pretrain import PretrainEnvEngine
        return PretrainEnvEngine
    if name == "nerf_adapt_st_gan":
        from .texture_gan import TextureGANEngine
        return TextureGANEngine
    raise KeyError(f"unknown model/engine: {name!r}")
