"""Streaming evaluation: device memory stays O(1 frame) for any split size
(VERDICT r2 item 2).

The reference evaluates through a batch-1 DataLoader
(/root/reference/data/base.py:33-41).  Round 2 instead device_put the WHOLE
eval split, which would OOM at the reference envelope: the 1869-frame Duck
syn2real test split at 480×640 (README.md:49-64) is ~7.4 MB/frame ≈ 13.8 GB
on a 16 GB v5e.  Engine.eval_frame now streams one frame at a time with a
size-1 device cache; this test drives a 32-frame 480×640 split through
evaluate_full and asserts the device-resident footprint stays frame-sized.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.data.fixture import generate_fixture
from test_texture_gan_e2e import tiny_gan_cfg

N_TEST = 32
EVAL_H, EVAL_W = 480, 640


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    # raw frames stay small (120×160) for generation speed; the syn2real
    # dataset's resize path upsamples to the full 480×640 eval envelope
    return generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=4, n_test=N_TEST, scene="scene_all",
                            image_scale=0.25, crop_res=32)


def _live_bytes(exclude_ids):
    import jax
    return sum(a.size * a.dtype.itemsize for a in jax.live_arrays()
               if id(a) not in exclude_ids)


def test_evaluate_full_streams_32_frames_480x640(root, tmp_path):
    import jax
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.syn2real = True
    cfg.data.image_size = [EVAL_H, EVAL_W]
    cfg.data.raw_size = [120, 160]
    cfg.H, cfg.W = EVAL_H, EVAL_W
    cfg.nerf.sample_intvs = 4            # keep the CPU render cheap
    cfg.nerf.rand_rays = 4096

    baseline = {id(a) for a in jax.live_arrays()}
    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    assert len(eng.eval_data) == N_TEST
    assert not hasattr(eng, "eval_batch")     # the r2 whole-split attr
    eng.build_networks()
    eng.setup_optimizer()

    res = eng.evaluate_full()
    assert np.isfinite(res["psnr"]) and np.isfinite(res["ssim"])
    out_dir = os.path.join(cfg.output_path, "test_view_last")
    assert len(os.listdir(out_dir)) == N_TEST

    # frame budget: image 3HW + z_near/z_far 2HW + mask HW (+pose/intr) f32
    frame_bytes = 6 * EVAL_H * EVAL_W * 4
    split_bytes = N_TEST * frame_bytes        # what r2 would have held
    live = _live_bytes(baseline)
    # params + VGG + a handful of frame-sized render buffers fit in a few
    # frames' worth; the whole-split prefetch (~236 MB) cannot
    assert live < split_bytes // 3, (
        f"device footprint {live/1e6:.1f} MB suggests whole-split "
        f"prefetch (split={split_bytes/1e6:.1f} MB)")


def test_eval_frame_cache_reuses_device_copy(root, tmp_path):
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.name = "cache_test"
    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    f0 = eng.eval_frame(0)
    assert eng.eval_frame(0) is f0            # size-1 cache hit
    f1 = eng.eval_frame(1)
    assert f1 is not f0
    assert int(np.asarray(f1["idx"])[0]) == 1
    f0b = eng.eval_frame(0)                   # slot was replaced
    assert f0b is not f0
    np.testing.assert_array_equal(np.asarray(f0b["image"]),
                                  np.asarray(f0["image"]))


def test_eval_frames_prefetch_order_and_coherence(root, tmp_path):
    """The r5 pipelined eval (Engine.eval_frames): frames arrive in order,
    content matches the direct dataset read, and the size-1 eval_frame
    cache stays coherent with the yielded frame."""
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.name = "prefetch_test"
    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)

    seen = []
    for i, frame, sample in eng.eval_frames():
        seen.append(i)
        direct = eng.eval_data[i]
        assert set(sample.keys()) == set(direct.keys())
        np.testing.assert_array_equal(sample["image"], direct["image"])
        np.testing.assert_array_equal(np.asarray(frame["image"])[0],
                                      direct["image"])
        # cache coherence: eval_frame(i) must reuse the prefetched copy
        assert eng.eval_frame(i) is frame
        if len(seen) >= 6:
            break                                  # early exit must not hang
    assert seen == list(range(len(seen)))

    # a fresh full iteration after the early exit works and covers the split
    order = [i for i, _, _ in eng.eval_frames(indices=range(4))]
    assert order == [0, 1, 2, 3]


def test_eval_frames_propagates_loader_errors(root, tmp_path):
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.name = "prefetch_err"
    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)

    class Boom(Exception):
        pass

    real = eng.eval_data

    class FlakyDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise Boom("bad frame")
            return real[i]

    eng.eval_data = FlakyDS()
    got = []
    with pytest.raises(Boom):
        for i, _, _ in eng.eval_frames():
            got.append(i)
    assert got == [0, 1]


def test_compact_eval_matches_plain(root, tmp_path):
    """The r5 compact eval payload (uint8 image/mask upload + host-gathered
    object-ray z bounds + fused render/metrics/PNG jit) must reproduce the
    plain f32 path: same metrics, same PNG files.  The payload is
    bitwise-lossless by construction (dataset images are uint8/255 PNGs,
    masks {0,1}, z values the same f32 map reads)."""
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.syn2real = True
    cfg.data.image_size = [120, 160]
    cfg.H, cfg.W = 120, 160
    cfg.nerf.sample_intvs = 4
    cfg.nerf.rand_rays = 1024

    results, pngs = {}, {}
    for mode in ("compact", "plain"):
        cfg.name = f"cmp_{mode}"
        cfg.render.eval_compact = mode == "compact"
        eng = TextureGANEngine(cfg)
        eng.load_dataset(eval_split="test", prefetch_train=False)
        eng.build_networks()
        eng.setup_optimizer()
        if mode == "plain":
            assert eng._eval_compact_transform() is None
        else:
            assert eng._eval_compact_transform() is not None
        results[mode] = eng.evaluate_full()
        out_dir = os.path.join(eng.cfg.output_path, "test_view_last")
        pngs[mode] = {f: open(os.path.join(out_dir, f), "rb").read()
                      for f in sorted(os.listdir(out_dir))
                      if f.endswith(".png")}
    assert abs(results["compact"]["psnr"] - results["plain"]["psnr"]) < 1e-3
    assert abs(results["compact"]["ssim"] - results["plain"]["ssim"]) < 1e-4
    assert set(pngs["compact"]) == set(pngs["plain"])
    import cv2
    for f in pngs["plain"]:
        if pngs["compact"][f] == pngs["plain"][f]:
            continue
        a = cv2.imdecode(np.frombuffer(pngs["compact"][f], np.uint8), -1)
        b = cv2.imdecode(np.frombuffer(pngs["plain"][f], np.uint8), -1)
        # XLA may fuse the in-jit render+metrics graph differently from the
        # two-dispatch plain path; allow the uint8 rounding boundary only
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 1, f


class _DenseAt:
    """eval_data proxy: truncates to n frames and makes frame `i` dense
    (full mask) so it exceeds the compact route's coverage bound and takes
    the per-frame f32 fallback mid-sweep."""

    def __init__(self, ds, i, n):
        self._ds, self._i, self._n = ds, i, n

    def __getattr__(self, k):
        return getattr(self._ds, k)

    def __len__(self):
        return self._n

    def __getitem__(self, j):
        s = self._ds[j]
        if j == self._i:
            s["obj_mask"] = np.ones_like(s["obj_mask"])
        return s


def test_compact_eval_mixed_fallback_sweep(root, tmp_path):
    """A dense frame mid-sweep falls back to the plain f32 route INSIDE one
    evaluate_full while its neighbors stay on the sparse compact route;
    per-frame metrics match an all-plain sweep on the same frames."""
    from texpose_tpu.models.texture_gan import TextureGANEngine

    def read_quant(path):
        lines = open(os.path.join(path, "quant.txt")).read().splitlines()
        keys = lines[0].split()[2:]      # "# frame psnr ssim ..."
        return [dict(zip(keys, map(float, ln.split()[1:])))
                for ln in lines[1:] if ln.strip()]

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.syn2real = True
    cfg.data.image_size = [120, 160]
    cfg.H, cfg.W = 120, 160
    cfg.nerf.sample_intvs = 4
    cfg.nerf.rand_rays = 1024

    rows = {}
    for mode in ("compact", "plain"):
        cfg.name = f"mix_{mode}"
        cfg.render.eval_compact = mode == "compact"
        eng = TextureGANEngine(cfg)
        eng.load_dataset(eval_split="test", prefetch_train=False)
        eng.build_networks()
        eng.setup_optimizer()
        eng.eval_data = _DenseAt(eng.eval_data, 1, 3)
        res = eng.evaluate_full()
        assert np.isfinite(res["psnr"])
        rows[mode] = read_quant(eng.cfg.output_path)
    assert len(rows["compact"]) == 3
    for rc, rp in zip(rows["compact"], rows["plain"]):
        assert abs(rc["psnr"] - rp["psnr"]) < 1e-3, (rc, rp)
        assert abs(rc["ssim"] - rp["ssim"]) < 1e-4, (rc, rp)


def test_compact_transform_payload(root, tmp_path):
    """Payload invariants: the sparse uint8 GT pixels reproduce image*mask
    exactly when scattered (every metric compares against image*mask), z
    bounds equal the map values at the padded index set, the worker thread
    stashes the host index copy for the consumer, dense frames fall
    back."""
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from texpose_tpu.models.render import masked_ray_indices

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.name = "payload_test"
    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    tf = eng._eval_compact_transform()
    assert tf is not None
    sample = eng.eval_data[0]
    pl = tf(sample)
    assert "image_sparse_u8" in pl and "image" not in pl
    idx_p, _ = masked_ray_indices(sample["obj_mask"].reshape(-1),
                                  int(cfg.nerf.rand_rays))
    np.testing.assert_array_equal(pl["idx"], idx_p)
    np.testing.assert_array_equal(sample["_idx_host"], idx_p)
    # scatter of the sparse GT == image * mask (bitwise, u8/255 source)
    HW = sample["image"].shape[-2] * sample["image"].shape[-1]
    recon = np.zeros((HW, 3), np.float32)
    recon[idx_p] = pl["image_sparse_u8"].astype(np.float32) / 255.0
    masked = (sample["image"].reshape(3, -1).T
              * (sample["obj_mask"].reshape(-1, 1) > 0))
    np.testing.assert_array_equal(recon, masked)
    np.testing.assert_array_equal(
        pl["z_near_pre"][0], sample["z_near"].reshape(-1)[idx_p])
    np.testing.assert_array_equal(
        pl["z_far_pre"][0], sample["z_far"].reshape(-1)[idx_p])
    # dense frame → standard payload fallback
    dense = dict(sample)
    dense["obj_mask"] = np.ones_like(sample["obj_mask"])
    pl2 = tf(dense)
    assert "image_sparse_u8" not in pl2 and "image" in pl2


def test_masked_st_pre_matches_gathered(root, tmp_path):
    """render_rays_masked_st_pre (host-pre-gathered z) is bitwise-equal to
    render_rays_masked_st (device z gather) on the same index set."""
    import jax
    import jax.numpy as jnp
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from texpose_tpu.models.render import (render_rays_masked_st,
                                           render_rays_masked_st_pre,
                                           masked_ray_indices)
    from texpose_tpu.models.pretrain import _compute_dtype

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.name = "pre_test"
    cfg.nerf.sample_intvs = 4
    cfg.nerf.rand_rays = 256
    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    eng.build_networks()
    sample = eng.eval_data[0]
    idx_p, _ = masked_ray_indices(sample["obj_mask"].reshape(-1), 256)
    pose = jnp.asarray(sample["pose"], jnp.float32)[None]
    intr = jnp.asarray(sample["intr"], jnp.float32)[None]
    zn = jnp.asarray(sample["z_near"], jnp.float32).reshape(1, -1)
    zf = jnp.asarray(sample["z_far"], jnp.float32).reshape(1, -1)
    lt = jnp.zeros((1, int(cfg.nerf.N_latent_trans)))
    ll = jnp.zeros((1, int(cfg.nerf.N_latent_light)))
    key = jax.random.PRNGKey(0)
    params = eng.state["params"]["nerf"]
    a = render_rays_masked_st(params, cfg, pose, intr, jnp.asarray(idx_p),
                              zn, zf, lt, ll, key,
                              compute_dtype=_compute_dtype(cfg), chunk=256)
    b = render_rays_masked_st_pre(
        params, cfg, pose, intr, jnp.asarray(idx_p),
        jnp.asarray(np.asarray(zn)[0][idx_p])[None],
        jnp.asarray(np.asarray(zf)[0][idx_p])[None], lt, ll, key,
        compute_dtype=_compute_dtype(cfg), chunk=256)
    assert set(a.keys()) == set(b.keys())
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


def test_pretrain_compact_eval_matches_plain(root, tmp_path):
    """Pretrain engine: the compact uint8 eval payload (full-frame route,
    z maps still f32) reproduces the plain path's metrics and PNGs."""
    from test_pretrain_e2e import tiny_pretrain_cfg
    from texpose_tpu.models.pretrain import PretrainEngine

    results, pngs = {}, {}
    for mode in ("compact", "plain"):
        cfg = tiny_pretrain_cfg(root, tmp_path)
        cfg.data.scene = "scene_all"
        cfg.name = f"pre_cmp_{mode}"
        cfg.max_iter = 2
        cfg.render = {"eval_compact": mode == "compact"}
        eng = PretrainEngine(cfg)
        eng.load_dataset()
        eng.build_networks()
        eng.setup_optimizer()
        if mode == "plain":
            assert eng._eval_compact_transform() is None
        else:
            assert eng._eval_compact_transform() is not None
        results[mode] = eng.evaluate_full()
        out_dir = os.path.join(eng.cfg.output_path, "rgb")
        pngs[mode] = {f: open(os.path.join(out_dir, f), "rb").read()
                      for f in sorted(os.listdir(out_dir))}
    assert abs(results["compact"]["psnr"] - results["plain"]["psnr"]) < 1e-3
    assert abs(results["compact"]["ssim"] - results["plain"]["ssim"]) < 1e-4
    assert pngs["compact"].keys() == pngs["plain"].keys()
    import cv2
    for f in pngs["plain"]:
        if pngs["compact"][f] == pngs["plain"][f]:
            continue
        a = cv2.imdecode(np.frombuffer(pngs["compact"][f], np.uint8), -1)
        b = cv2.imdecode(np.frombuffer(pngs["plain"][f], np.uint8), -1)
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 1, f


def test_async_writer_runs_jobs_and_reraises(tmp_path):
    from texpose_tpu.utils.pipeline import AsyncWriter

    done = []
    with AsyncWriter() as w:
        for i in range(16):
            w.submit(done.append, i)
    assert done == list(range(16))

    def boom():
        raise ValueError("write failed")

    with pytest.raises(ValueError, match="write failed"):
        with AsyncWriter() as w:
            w.submit(boom)


def test_prefetcher_next_after_exhaustion_raises(root):
    """next() after StopIteration (or after a re-raised worker error) must
    raise immediately, not block forever on the drained queue."""
    from texpose_tpu.utils.pipeline import EvalPrefetcher

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"x": np.zeros((2,), np.float32)}

    with EvalPrefetcher(DS(), depth=1) as pf:
        assert len(list(pf)) == 2
        with pytest.raises(StopIteration):
            next(pf)

    class Boom(DS):
        def __getitem__(self, i):
            raise RuntimeError("disk error")

    with EvalPrefetcher(Boom(), depth=1) as pf:
        with pytest.raises(RuntimeError):
            next(pf)
        with pytest.raises(StopIteration):
            next(pf)
