"""Dev utility: short real-config training runs on the TPU to validate that
the fused kernels TRAIN correctly on hardware (loss decreases, PSNR rises,
no NaNs in bf16).  Run after kernel changes."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.models.pretrain import PretrainEngine
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from texpose_tpu.data.fixture import generate_fixture

    cache = os.path.join(tempfile.gettempdir(), "texpose_qual_fixture_v3")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=2, scene="scene_qual",
                         image_scale=1.0, crop_res=128, fixed_light=False)
        open(os.path.join(cache, ".done"), "w").close()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def base(yaml_name):
        cfg = load_yaml(os.path.join(here, "configs", yaml_name))
        cfg.yaml = "x"
        cfg = process_options(cfg)
        cfg.data.root = cache
        cfg.data.splits_root = os.path.join(cache, "splits")
        cfg.data.object = "ball"
        cfg.output_root = os.path.join(tempfile.gettempdir(), "texpose_qual")
        return process_options(cfg)

    # ---- geometry pretrain (fused trunk fwd + XLA bwd; trunk TRAINS) ----
    cfg = base("nerf_lm_pretrain.yaml")
    cfg.data.scene = "scene_qual"          # != scene_all → real depth maps
    cfg.data.pose_source = "gt"
    cfg.nerf.depth.box_source = "gt_box"
    cfg.max_iter = int(os.environ.get("QUAL_PRETRAIN_ITERS", "4000"))
    cfg.name = "qual_pretrain"
    cfg = process_options(cfg)
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    key = jax.random.PRNGKey(0)
    first = None
    import time
    t0 = time.time()
    for it in range(cfg.max_iter):
        key, sub = jax.random.split(key)
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch, sub,
                                      jnp.asarray(it, jnp.int32))
        if it == 20:
            first = float(np.asarray(loss["all"]))
    last = float(np.asarray(loss["all"]))
    dt = time.time() - t0
    print(f"PRETRAIN: loss {first:.4f} -> {last:.4f} "
          f"({cfg.max_iter/dt:.1f} it/s)", flush=True)
    val = eng.validate(cfg.max_iter)
    print(f"PRETRAIN val: {val}", flush=True)
    assert last < first * 0.7 and np.isfinite(last)
    trunk_ckpt = os.path.join(cfg.output_path, "..", "pretrain_model.ckpt")
    eng.save_checkpoint(cfg.max_iter)
    import shutil
    shutil.copyfile(os.path.join(cfg.output_path, "model.ckpt"),
                    os.path.abspath(trunk_ckpt))

    # ---- texture GAN (fused ST-field fwd+bwd; heads+latents train) ----
    cfg2 = base("nerf_lm_adapt_gan.yaml")
    cfg2.data.scene = "scene_qual"
    cfg2.nerf.depth.box_source = "pred_box_init_calib"
    cfg2.max_iter = int(os.environ.get("QUAL_GAN_ITERS", "2000"))
    cfg2.name = "qual_gan"
    cfg2.resume_pretrain = True
    cfg2 = process_options(cfg2)
    eng2 = TextureGANEngine(cfg2)
    eng2.load_dataset()
    eng2.build_networks()
    eng2.setup_optimizer()
    eng2.restore_pretrained_checkpoint()
    key = jax.random.PRNGKey(1)
    first = None
    t0 = time.time()
    for it in range(cfg2.max_iter):
        key, sub = jax.random.split(key)
        eng2.state, loss = eng2.step_fn(eng2.state, eng2.train_batch, sub,
                                        jnp.asarray(it, jnp.int32))
        if it == 20:
            first = float(np.asarray(loss["render"]))
    dt = time.time() - t0
    host = {k: float(np.asarray(v)) for k, v in loss.items()}
    print(f"GAN: render {first:.4f} -> {host['render']:.4f} "
          f"({cfg2.max_iter/dt:.1f} it/s); last={host}", flush=True)
    assert all(np.isfinite(v) for v in host.values()), host
    val = eng2.validate(cfg2.max_iter)
    print(f"GAN val: {val}", flush=True)
    res = eng2.evaluate_full()
    print(f"GAN eval_full: {res}", flush=True)


if __name__ == "__main__":
    main()
