"""Golden tests for posenc / compositing / grid_sample / color / ssim / knn."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu import ops as O


# ------------------------------------------------------------------- posenc

def test_posenc_shape_and_ordering():
    x = jnp.array([[0.25, 0.5]])
    L = 4
    enc = O.positional_encoding(x, L)
    assert enc.shape == (1, 2 * 2 * L)
    # layout per dim: [sin(f0 x)...sin(f3 x), cos(f0 x)...cos(f3 x)]
    f = 2.0 ** np.arange(L) * np.pi
    expect_dim0 = np.concatenate([np.sin(0.25 * f), np.cos(0.25 * f)])
    np.testing.assert_allclose(enc[0, :2 * L], expect_dim0, atol=1e-6)


def test_posenc_c2f_window():
    x = jnp.ones((3, 3)) * 0.3
    L = 6
    # progress 0 → all frequencies off
    enc0 = O.positional_encoding(x, L, progress=jnp.array(0.0), c2f_range=(0, 1))
    np.testing.assert_allclose(enc0, 0.0, atol=1e-7)
    # progress 1 → identical to un-windowed
    enc1 = O.positional_encoding(x, L, progress=jnp.array(1.0), c2f_range=(0, 1))
    enc_full = O.positional_encoding(x, L)
    np.testing.assert_allclose(enc1, enc_full, atol=1e-6)
    # mid progress: low freqs on, high freqs off
    encm = O.positional_encoding(x, L, progress=jnp.array(0.5), c2f_range=(0, 1))
    em = np.asarray(encm).reshape(3, 3, 2, L)
    assert np.abs(em[..., 0]).max() > 0
    np.testing.assert_allclose(em[..., -1], 0.0, atol=1e-7)


def test_posenc_c2f_start_offset():
    x = jnp.ones((1, 1))
    L = 4
    # with start offset 2, at alpha=1 bands k-2∈{-2,-1,0,1}: clamp gives 1,1,1,0
    enc = O.positional_encoding(x, L, progress=jnp.array(1.0 / L),
                                c2f_range=(0, 1), c2f_start=2)
    e = np.asarray(enc).reshape(2, L)
    assert np.abs(e[:, 0]).max() > 0 and np.abs(e[:, 1]).max() > 0
    np.testing.assert_allclose(e[:, 3], 0.0, atol=1e-7)


def test_posenc_with_identity():
    x = jnp.ones((2, 3)) * 0.1
    out = O.posenc_with_identity(x, 10)
    assert out.shape == (2, 3 + 60)
    np.testing.assert_allclose(out[..., :3], 0.1)


# ------------------------------------------------------------ depth sampling

def test_sample_depth(key):
    lo = jnp.full((2, 5), 1.0)
    hi = jnp.full((2, 5), 3.0)
    d = O.sample_depth(key, lo, hi, 16)
    assert d.shape == (2, 5, 16, 1)
    assert float(d.min()) >= 1.0 and float(d.max()) <= 3.0
    assert np.all(np.diff(np.asarray(d)[..., 0], axis=-1) > 0)
    d_det = O.sample_depth(key, lo, hi, 4, stratified=False)
    np.testing.assert_allclose(d_det[0, 0, :, 0], [1.25, 1.75, 2.25, 2.75])


# ---------------------------------------------------------------- composite

def test_composite_constant_density():
    B, R, N = 1, 4, 64
    sigma = 2.0
    depth = jnp.linspace(1.0, 2.0, N).reshape(1, 1, N, 1).repeat(R, 1)
    rgb = jnp.ones((B, R, N, 3)) * 0.7
    density = jnp.full((B, R, N), sigma)
    ray = jnp.tile(jnp.array([0.0, 0, 1]), (B, R, 1))
    out = O.composite(rgb, density, depth, ray)
    # last interval is 1e10 → opacity saturates to 1
    np.testing.assert_allclose(out["opacity"], 1.0, atol=1e-5)
    np.testing.assert_allclose(out["rgb"], 0.7, atol=1e-4)
    # prob sums to opacity
    np.testing.assert_allclose(out["prob"].sum(-2), out["opacity"], atol=1e-6)


def test_composite_empty_space():
    B, R, N = 1, 3, 32
    depth = jnp.linspace(1.0, 2.0, N).reshape(1, 1, N, 1).repeat(R, 1)
    out = O.composite(jnp.ones((B, R, N, 3)), jnp.zeros((B, R, N)), depth,
                      jnp.ones((B, R, 3)))
    np.testing.assert_allclose(out["opacity"], 0.0, atol=1e-6)
    np.testing.assert_allclose(out["rgb"], 0.0, atol=1e-6)
    out_bg = O.composite(jnp.ones((B, R, N, 3)), jnp.zeros((B, R, N)), depth,
                         jnp.ones((B, R, 3)), setbg_opaque=True, bgcolor=0.25)
    np.testing.assert_allclose(out_bg["rgb"], 0.25, atol=1e-6)


def test_composite_static_transient_consistency():
    """With zero transient density the dual composite must reduce to vanilla."""
    B, R, N = 2, 8, 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    depth = jnp.sort(jax.random.uniform(k1, (B, R, N, 1), minval=1, maxval=2), axis=2)
    rgb_s = jax.random.uniform(k2, (B, R, N, 3))
    dens_s = jax.random.uniform(k3, (B, R, N)) * 3
    rgb = jnp.stack([rgb_s, jnp.zeros_like(rgb_s)], axis=-1)
    dens = jnp.stack([dens_s, jnp.zeros_like(dens_s)], axis=-1)
    uncert = jnp.ones((B, R, N, 1))
    out = O.composite_static_transient(rgb, dens, depth, jnp.ones((B, R, 3)),
                                       uncert, min_uncert=0.05)
    ref = O.composite(rgb_s, dens_s, depth, jnp.ones((B, R, 3)))
    np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=1e-5)
    np.testing.assert_allclose(out["rgb_static"], ref["rgb"], atol=1e-5)
    np.testing.assert_allclose(out["opacity"], ref["opacity"], atol=1e-5)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-5)
    np.testing.assert_allclose(out["rgb_transient"], 0.0, atol=1e-6)
    np.testing.assert_allclose(out["opacity_transient"], 0.0, atol=1e-6)
    # uncertainty floors at min_uncert when no transient mass
    np.testing.assert_allclose(out["uncert"], 0.05, atol=1e-6)


# -------------------------------------------------------------- grid_sample

@pytest.mark.parametrize("mode,align", [("bilinear", True), ("bilinear", False),
                                        ("nearest", False)])
def test_grid_sample_matches_torch(rng, mode, align):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    img = rng.normal(size=(2, 3, 9, 7)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(2, 5, 6, 2))).astype(np.float32)
    ours = O.grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode,
                         align_corners=align)
    theirs = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                           mode=mode, align_corners=align).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@pytest.mark.parametrize("mode,align", [("bilinear", True), ("bilinear", False),
                                        ("nearest", False)])
def test_grid_sample_table_matches_gather(rng, mode, align):
    # composed frame+pixel gather ≡ gather-frames-then-grid_sample
    from texpose_tpu.ops.grid_sample import grid_sample_table
    table = rng.normal(size=(5, 3, 9, 7)).astype(np.float32)
    idx = np.array([3, 0, 3, 4], dtype=np.int32)        # incl. a repeat
    grid = (rng.uniform(-1.3, 1.3, size=(4, 5, 6, 2))).astype(np.float32)
    direct = grid_sample_table(jnp.asarray(table), jnp.asarray(idx),
                               jnp.asarray(grid), mode=mode,
                               align_corners=align)
    ref = O.grid_sample(jnp.asarray(table[idx]), jnp.asarray(grid),
                        mode=mode, align_corners=align)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(ref), atol=1e-6)


# -------------------------------------------------------------------- color

def test_rgb_to_lab_known_values():
    # sRGB primaries, D65/2°: red=(53.24,80.09,67.20), white=(100,0,0)
    rgb = jnp.array([[1.0, 1.0], [0.0, 1.0], [0.0, 1.0]])[None]  # red, white
    rgb = rgb.reshape(1, 3, 1, 2)
    lab = np.asarray(O.rgb_to_lab(rgb))
    np.testing.assert_allclose(lab[0, :, 0, 0], [53.24, 80.09, 67.20], atol=0.1)
    np.testing.assert_allclose(lab[0, :, 0, 1], [100.0, 0.0, 0.0], atol=0.01)


def test_normalize_lab_range():
    lab = jnp.array([100.0, 127.0, -127.0]).reshape(1, 3, 1, 1)
    n = np.asarray(O.normalize_lab(lab))
    np.testing.assert_allclose(n[0, :, 0, 0], [1.0, 1.0, 0.0], atol=1e-6)


# --------------------------------------------------------------------- ssim

def test_ssim_identical_and_noise(rng):
    img = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
    assert float(O.ssim(img, img)) > 0.999
    noisy = jnp.clip(img + 0.3 * jnp.asarray(
        rng.normal(size=(1, 3, 32, 32)).astype(np.float32)), 0, 1)
    s = float(O.ssim(img, noisy))
    assert 0.0 < s < 0.9


def test_ssim_matches_reference_formula(rng):
    """Cross-check against a direct torch port of the vendored SSIM."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from math import exp

    def ref_ssim(i1, i2, ws=11):
        g = torch.tensor([exp(-(x - ws // 2) ** 2 / (2 * 1.5 ** 2))
                          for x in range(ws)])
        g = (g / g.sum()).unsqueeze(1)
        win = g.mm(g.t()).unsqueeze(0).unsqueeze(0)
        ch = i1.size(1)
        win = win.expand(ch, 1, ws, ws).contiguous()
        mu1 = F.conv2d(i1, win, padding=ws // 2, groups=ch)
        mu2 = F.conv2d(i2, win, padding=ws // 2, groups=ch)
        mu1s, mu2s, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(i1 * i1, win, padding=ws // 2, groups=ch) - mu1s
        s2 = F.conv2d(i2 * i2, win, padding=ws // 2, groups=ch) - mu2s
        s12 = F.conv2d(i1 * i2, win, padding=ws // 2, groups=ch) - mu12
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1s + mu2s + C1) * (s1 + s2 + C2))
        return m.mean().item()

    a = rng.uniform(size=(1, 3, 24, 24)).astype(np.float32)
    b = rng.uniform(size=(1, 3, 24, 24)).astype(np.float32)
    ours = float(O.ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = ref_ssim(torch.from_numpy(a), torch.from_numpy(b))
    assert abs(ours - theirs) < 1e-4


# ---------------------------------------------------------------------- knn

def test_knn_and_chamfer(rng):
    x = jnp.asarray(rng.normal(size=(2, 20, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 30, 3)).astype(np.float32))
    dists, idx = O.knn_points(x, y, K=3)
    # brute-force oracle
    d_full = ((np.asarray(x)[:, :, None] - np.asarray(y)[:, None]) ** 2).sum(-1)
    oracle = np.sort(d_full, axis=-1)[..., :3]
    np.testing.assert_allclose(np.sort(np.asarray(dists), -1), oracle, atol=1e-5)
    # chamfer with self is 0
    assert float(O.chamfer_distance(x, x)) < 1e-6
    # masked padding is excluded
    y_pad = jnp.concatenate([y, jnp.zeros((2, 5, 3))], axis=1)
    y_mask = jnp.concatenate([jnp.ones((2, 30), bool), jnp.zeros((2, 5), bool)], 1)
    d2, _ = O.knn_points(x, y_pad, K=1, y_mask=y_mask)
    d1, _ = O.knn_points(x, y, K=1)
    np.testing.assert_allclose(d2, d1, atol=1e-6)


def test_knn_gather(rng):
    feats = jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32))
    idx = jnp.array([[[2, 5], [0, 9]]])
    out = O.knn_gather(feats, idx)
    np.testing.assert_allclose(out[0, 0, 1], feats[0, 5])
    np.testing.assert_allclose(out[0, 1, 0], feats[0, 0])


# ----------------------------------------------------------- image resize

@pytest.mark.parametrize("shapes", [((120, 160), (480, 640)),
                                    ((480, 640), (120, 160)),
                                    ((32, 48), (100, 100))])
def test_resize_bilinear_matches_cv2(rng, shapes):
    """ops.image.resize_bilinear pins cv2.resize INTER_LINEAR float
    semantics — the device-side eval metrics path must produce the same
    PSNR as the reference's host cv2 resize
    (/root/reference/model/nerf_adapt_st_gan.py:341-349)."""
    import cv2
    from texpose_tpu.ops.image import resize_bilinear
    (H, W), (oH, oW) = shapes
    img = rng.random((H, W, 3)).astype(np.float32)
    ref = cv2.resize(img, (oW, oH), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(img), (oH, oW)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # 2-D single-channel path (masks/depth)
    img2 = rng.random((H, W)).astype(np.float32)
    ref2 = cv2.resize(img2, (oW, oH), interpolation=cv2.INTER_LINEAR)
    got2 = np.asarray(resize_bilinear(jnp.asarray(img2), (oH, oW)))
    np.testing.assert_allclose(got2, ref2, atol=1e-5)


def test_resize_bilinear_identity():
    from texpose_tpu.ops.image import resize_bilinear
    img = jnp.arange(12.0).reshape(2, 2, 3)
    assert resize_bilinear(img, (2, 2)) is img


def test_masked_psnr_counts_broadcast_elements(rng):
    """psnr with a channel-less [H,W,1] mask must not inflate MSE by the
    channel count: equal to psnr over the pre-masked arrays' nonzero
    region computed with an explicitly broadcast mask."""
    import jax.numpy as jnp
    from texpose_tpu.utils.metrics import psnr

    pred = jnp.asarray(rng.random((8, 8, 3), np.float32))
    tgt = jnp.asarray(rng.random((8, 8, 3), np.float32))
    mask = jnp.asarray((rng.random((8, 8, 1)) > 0.5).astype(np.float32))
    got = float(psnr(pred, tgt, mask))
    m3 = jnp.broadcast_to(mask, pred.shape)
    mse = float((((pred - tgt) ** 2) * m3).sum() / m3.sum())
    want = -10.0 * np.log10(mse + 1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-5)
