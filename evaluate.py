"""Evaluation entry point.

Usage parity with the reference (/root/reference/evaluate.py:12-28):
    python evaluate.py --model=nerf_adapt_st_gan --yaml=configs/nerf_lm_adapt_gan.yaml
        --data.image_size=[480,640] --resume --syn2real ...
"""

import sys

from texpose_tpu.utils.config import set_options
from texpose_tpu.utils.log import log
from texpose_tpu.models import get_engine


def main(argv=None):
    cfg = set_options(argv)
    log.title(f"[{' '.join(sys.argv)}]")
    engine = get_engine(cfg.model)(cfg)
    engine.load_dataset(eval_split=cfg.get("eval_split", "test"),
                        prefetch_train=False)
    engine.build_networks()
    engine.setup_optimizer()
    engine.load_initial_weights()
    engine.restore_checkpoint()
    engine.evaluate_full()
    if cfg.get("video"):
        # novel-view orbit renders + mp4s (reference evaluate.py:28's
        # generate_videos_synthesis hook; NotImplementedError for the GAN
        # model there and here)
        engine.generate_videos_synthesis()
    return engine


if __name__ == "__main__":
    main()
