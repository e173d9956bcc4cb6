"""Ablation harness for the 10k-step GAN quality collapse (VERDICT r1 #3).

Trains the texture-GAN on the qual fixture under several loss/config
variants, evaluating test-split PSNR/SSIM at regular checkpoints with BOTH
light-latent selection modes (reference pose-anchor vs mean), plus latent
norm statistics — enough signal to separate adversarial drift from
per-image-latent divergence.

One TPU process; run variants sequentially.  Env:
  ABL_VARIANTS=base,latreg,lab,nofeat   which variants to run
  ABL_STEPS=10000                       real steps per variant
  ABL_EVERY=2000                        eval interval (real steps)
  QUAL_PRETRAIN_ITERS=4000              trunk pretrain length (dispatches)

Results: one JSON line per checkpoint on stdout and appended to
/tmp/texpose_qual/ablation_results.jsonl.
"""

import json
import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_quality_check import _fixture, _base, pretrain_stage  # noqa: E402


VARIANTS = {
    # name -> cfg edits (applied after base gan yaml)
    "base": {},
    # L2 on per-image latents: keeps light/transient embeddings
    # in-distribution so eval anchor selection stays meaningful
    "latreg": {("loss_weight", "latent_reg"): -1},
    # Lab chromaticity anchor to the synthetic render (lighting-free
    # color constraint; reference layers/lab_loss.py role)
    "lab": {("loss_weight", "lab"): -1},
    # kill the random-VGG perceptual loss entirely
    "nofeat": {("loss_weight", "feat"): None},
    # both stabilizers
    "latreg_lab": {("loss_weight", "latent_reg"): -1,
                   ("loss_weight", "lab"): -1},
    # discriminator lr follows the same decay as the generator, keeping
    # the D/G lr ratio constant over long horizons
    "disc_decay": {("optim_disc", "lr_end"): 1.e-5},
    # stronger R1 penalty (damps D sharpness → less adversarial drift)
    "r1_strong": {("loss_weight", "gan_reg_real"): 2},
    # weaker GAN pull on the generator
    "gan_weak": {("loss_weight", "gan_nerf"): -2},
    # no GAN gradient into the generator at all: if this still collapses,
    # the decline is plain novel-view overfitting, not adversarial drift
    "nogan": {("loss_weight", "gan_nerf"): None},
}


def _fixture_n(n_train):
    """Qual fixture with a custom train-set size (tests the few-shot
    overfitting hypothesis: 16 fixture images vs ~180 real LineMOD)."""
    import tempfile as _tf
    from texpose_tpu.data.fixture import generate_fixture
    cache = os.path.join(_tf.gettempdir(), f"texpose_qual_fixture_n{n_train}")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=n_train, n_test=2, scene="scene_qual",
                         image_scale=1.0, crop_res=128, fixed_light=False)
        open(os.path.join(cache, ".done"), "w").close()
    return cache


def _set(cfg, path, value):
    node = cfg
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def latent_stats(eng):
    ll = np.asarray(eng.state["latents"]["light"])
    lt = np.asarray(eng.state["latents"]["trans"])
    return {
        "light_norm_mean": float(np.linalg.norm(ll, axis=1).mean()),
        "light_norm_max": float(np.linalg.norm(ll, axis=1).max()),
        "light_spread": float(np.linalg.norm(ll - ll.mean(0), axis=1).mean()),
        "trans_norm_mean": float(np.linalg.norm(lt, axis=1).mean()),
    }


def run_variant(name, edits, cache, steps, every, out_f):
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = _base("nerf_lm_adapt_gan.yaml", cache)
    cfg.data.scene = "scene_qual"
    cfg.nerf.depth.box_source = "pred_box_init_calib"
    cfg.max_iter = steps
    cfg.name = f"abl_{name}"
    cfg.resume_pretrain = True
    for path, value in edits.items():
        _set(cfg, path, value)
    cfg = process_options(cfg)

    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test")
    eng.build_networks()
    eng.setup_optimizer()
    eng.restore_pretrained_checkpoint()
    K = eng.scan_k()
    assert every % K == 0, (every, K)

    done = 0
    t0 = time.time()
    while done < steps:
        for _ in range(every // K):
            eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        done += every
        host = {k: float(np.asarray(v)) for k, v in loss.items()}
        assert all(np.isfinite(v) for v in host.values()), host
        row = {"variant": name, "step": done,
               "it_per_sec": round(done / (time.time() - t0), 1),
               "loss_all": round(host["all"], 4)}
        for mode in ("anchor", "mean"):
            eng.cfg.render.light = mode
            res = eng.evaluate_full()
            row[f"psnr_{mode}"] = round(res["psnr"], 2)
            row[f"ssim_{mode}"] = round(res["ssim"], 3)
        row.update({k: round(v, 3) for k, v in latent_stats(eng).items()})
        line = json.dumps(row)
        print(line, flush=True)
        out_f.write(line + "\n")
        out_f.flush()


def main():
    cache = _fixture()
    qual_root = os.path.join(tempfile.gettempdir(), "texpose_qual")
    trunk = os.path.join(qual_root, "Duck", "pretrain_model.ckpt")
    if not os.path.exists(trunk):
        # group dir name depends on fixture config; search for it
        import glob
        hits = glob.glob(os.path.join(qual_root, "*", "pretrain_model.ckpt"))
        if hits:
            trunk = hits[0]
    if not os.path.exists(trunk):
        pretrain_stage(cache)
    else:
        print(f"PRETRAIN: reusing {trunk}", flush=True)

    steps = int(os.environ.get("ABL_STEPS", "10000"))
    every = int(os.environ.get("ABL_EVERY", "2000"))
    names = os.environ.get("ABL_VARIANTS", "base,latreg,lab,nofeat").split(",")
    os.makedirs(qual_root, exist_ok=True)
    with open(os.path.join(qual_root, "ablation_results.jsonl"), "a") as f:
        for name in names:
            print(f"=== variant {name} ===", flush=True)
            # composable: "data64+gan_weak" = 64-image fixture + the
            # gan_weak edits.  dataNN: base config on an NN-train-image
            # fixture (the trunk transfers: same analytic sphere).
            run_cache, edits = cache, {}
            for part in name.split("+"):
                if part.startswith("data"):
                    run_cache = _fixture_n(int(part[4:]))
                else:
                    edits.update(VARIANTS[part])
            run_variant(name, edits, run_cache, steps, every, f)


if __name__ == "__main__":
    main()
