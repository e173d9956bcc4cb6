"""Training entry point.

Usage parity with the reference (/root/reference/train.py:12-28):
    python train.py --model=nerf_pretrain --yaml=configs/nerf_lm_pretrain.yaml
        --group=Duck --name=run0 --k.e.y=value ...

Bootstraps: options → engine → load_dataset → build_networks →
setup_optimizer → restore(_pretrained)_checkpoint → train.
"""

import sys

from texpose_tpu.utils.config import set_options, save_options_file
from texpose_tpu.utils.log import log
from texpose_tpu.models import get_engine


def main(argv=None):
    cfg = set_options(argv)
    log.title(f"[{' '.join(sys.argv)}]")
    engine = get_engine(cfg.model)(cfg)
    engine.load_dataset()
    engine.build_networks()
    engine.setup_optimizer()
    engine.load_initial_weights()
    if cfg.get("resume_pretrain"):
        engine.restore_pretrained_checkpoint()
    elif cfg.get("resume_real"):
        engine.restore_field_checkpoint()
    engine.restore_checkpoint()
    if cfg.get("save_config_mode", True):
        save_options_file(cfg)
    engine.train()
    return engine


if __name__ == "__main__":
    main()
