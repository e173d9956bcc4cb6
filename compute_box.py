"""Ray-box calibration preprocessing CLI.

Capability parity with /root/reference/compute_box.py: for every frame in a
split, intersect per-pixel camera rays with the square-ified, enlarged CAD
AABB and save the (t_near, t_far) bounds as
<target_folder>/<box_dir>/<frame>.npz [2,H,W] (mm ray-parameter units).

Box construction (reference :232-252): AABB expanded by model.scale/6 along
each axis on both sides, then inflated 25% along its diagonal.

Usage:
    python compute_box.py --data_root dataset/lm --folder 000009 \
        --split_file splits/lm/duck/scene_all/train.txt \
        --cad_path dataset/lm/models/obj_000009.ply \
        --pred_loop init_calib [--use_gt_pose]
"""

import argparse
import json
import os

import numpy as np
import jax.numpy as jnp

from texpose_tpu.data.cad import CADModel
from texpose_tpu.data import bop
from texpose_tpu.geometry.rays import (aabb_ray_intersection,
                                       enlarge_diagonal)
from texpose_tpu.geometry.rays import get_center_and_ray


def squareify_aabb(model, scale_factor=6.0, enlarge=0.25):
    """Reference compute_box.py:232-252: ±scale/6 per axis + 25% diagonal."""
    mn, mx = model.aabb
    mn = mn - model.scale / scale_factor
    mx = mx + model.scale / scale_factor
    mn, mx = enlarge_diagonal(jnp.asarray(mn), jnp.asarray(mx), enlarge)
    return np.asarray(mn), np.asarray(mx)


def parse_options(argv=None):
    p = argparse.ArgumentParser(description="ray-box calibration")
    p.add_argument("--data_root", required=True,
                   help="BOP dataset root (contains the scene folder)")
    p.add_argument("--folder", required=True, help="scene folder, e.g. 000009")
    p.add_argument("--split_file", required=True)
    p.add_argument("--cad_path", required=True)
    p.add_argument("--pred_loop", default="init")
    p.add_argument("--use_gt_pose", action="store_true",
                   help="use GT poses (writes gt_box/) instead of predicted")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--target_folder", default=None,
                   help="output root (default: <data_root>/<folder>)")
    p.add_argument("--multi_obj", action="store_true")
    p.add_argument("--vis", action="store_true",
                   help="dump a QA overlay PNG for the last frame: CAD depth "
                        "rendered at the same pose vs the ray-box bounds "
                        "(headless equivalent of reference "
                        "compute_box.py:287-337)")
    return p.parse_args(argv)


def dump_box_vis(out_png, model, pose, K, box, H, W):
    """Render CAD depth with the native rasterizer and overlay it against
    the computed (t_near, t_far): every object pixel's depth must fall
    inside its ray-box interval.  Writes a 4-panel PNG and returns the
    violation fraction."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from texpose_tpu.raster.shaders import MeshRenderer

    mr = MeshRenderer(model.vertices, model.faces, H=H, W=W)
    _, depth = mr.render(pose, K, mode="mask", return_depth=True)
    depth = np.asarray(depth)[0]                             # [H,W], mm
    t_near, t_far = box[0], box[1]
    obj = depth > 0
    # rays hit the mesh but the box interval misses (or excludes) the hit
    bad = obj & ((depth < t_near - 1e-3) | (depth > t_far + 1e-3)
                 | (t_far <= 0))
    frac = float(bad.sum()) / max(int(obj.sum()), 1)

    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    for ax, (img, title) in zip(axes, [
            (np.where(obj, depth, np.nan), "CAD depth (mm)"),
            (np.where(t_far > 0, t_near, np.nan), "box t_near"),
            (np.where(t_far > 0, t_far, np.nan), "box t_far"),
            (bad.astype(np.float32), f"violations ({frac:.2%})")]):
        im = ax.imshow(img)
        ax.set_title(title)
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.04)
    fig.tight_layout()
    fig.savefig(out_png, dpi=80)
    plt.close(fig)
    return frac


def main(argv=None):
    opt = parse_options(argv)
    scene_dir = os.path.join(opt.data_root, opt.folder)
    target = opt.target_folder or scene_dir
    model = CADModel(opt.cad_path)
    aabb_min, aabb_max = squareify_aabb(model)

    with open(os.path.join(scene_dir, "scene_camera.json")) as f:
        scene_cam = json.load(f)
    with open(os.path.join(scene_dir, "scene_gt.json")) as f:
        scene_gt = json.load(f)
    pred_file = os.path.join(scene_dir, f"scene_pred_{opt.pred_loop}.json")
    scene_pred = None
    if os.path.exists(pred_file):
        with open(pred_file) as f:
            scene_pred = json.load(f)
    scene_obj = None
    if opt.multi_obj:
        with open(os.path.join(scene_dir, "scene_object.json")) as f:
            scene_obj = json.load(f)

    box_dir = "gt_box" if opt.use_gt_pose else f"pred_box_{opt.pred_loop}"
    out_dir = os.path.join(target, box_dir)
    os.makedirs(out_dir, exist_ok=True)

    lines = bop.readlines(opt.split_file)
    for line in lines:
        model_name, _, frame = bop.split_line(line)
        obj_scene_id = (int(scene_obj[str(frame)][model_name])
                        if opt.multi_obj else 0)
        source = scene_gt if opt.use_gt_pose else scene_pred
        if source is None:
            raise FileNotFoundError(f"missing {pred_file}")
        rec = source[str(frame)][obj_scene_id]
        R = np.array(rec["cam_R_m2c"], np.float32).reshape(3, 3)
        t = np.array(rec["cam_t_m2c"], np.float32)
        pose = np.concatenate([R, t[:, None]], axis=1)[None]        # mm
        K = np.array(scene_cam[str(frame)]["cam_K"],
                     np.float32).reshape(3, 3)[None]
        ray_o, ray_d = get_center_and_ray(jnp.asarray(pose), jnp.asarray(K),
                                          opt.height, opt.width)
        t_near, t_far, valid = aabb_ray_intersection(
            jnp.asarray(aabb_min), jnp.asarray(aabb_max), ray_o, ray_d)
        t_near = np.where(np.asarray(valid), np.asarray(t_near), 0.0)
        t_far = np.where(np.asarray(valid), np.asarray(t_far), 0.0)
        box = np.stack([t_near.reshape(opt.height, opt.width),
                        t_far.reshape(opt.height, opt.width)],
                       axis=0).astype(np.float32)
        if opt.multi_obj:
            fname = f"{frame:06d}_{obj_scene_id:06d}.npz"
        else:
            fname = f"{frame:06d}.npz"
        np.savez_compressed(os.path.join(out_dir, fname), data=box)
        last_vis = (pose, K, box)
    print(f"wrote {len(lines)} box files to {out_dir}")

    if opt.vis:
        if "last_vis" not in locals():
            print("box QA overlay skipped: no frames processed")
            return
        pose, K, box = last_vis
        png = os.path.join(out_dir, "box_vis.png")
        frac = dump_box_vis(png, model, pose, K, box, opt.height, opt.width)
        print(f"box QA overlay → {png} (violation fraction {frac:.2%})")


if __name__ == "__main__":
    main()
