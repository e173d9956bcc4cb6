#!/usr/bin/env python
"""Convert a reference-TexPose torch checkpoint into this framework's
flat-npz layout, so reference users can bring their trained models along.

The reference saves {epoch, iter, graph: state_dict, optim*, sched*} via
torch.save (/root/reference/util.py:244-263), with graph children
  nerf.mlp_feat.<i>.weight|bias     (ModuleList of Linear,
                                     layers/nerf.py:23-43 /
                                     layers/nerf_static_transient_light.py:23-59)
  nerf.mlp_rgb / nerf.mlp_trans     (same layout)
  latent_vars_trans.weight / latent_vars_light.weight
                                    (Embedding tables,
                                     model/nerf_adapt_st_gan.py:54-60)
  discriminator.{main,final}.<j>.weight_orig|weight_u
                                    (spectral-norm convs,
                                     layers/discriminator.py:28-115)

Emitted keys (this repo's engine-state keypaths, utils/checkpoint.py):
  step                                     (from ckpt["iter"])
  params/nerf/mlp_feat/<i>/w|b             (Linear weight TRANSPOSED: torch
  params/nerf/mlp_rgb/<i>/w|b               stores [out,in], we store [in,out])
  params/nerf/mlp_trans/<i>/w|b
  latents/trans | latents/light
  params/disc/main/<k>/w | params/disc/final/<k>/w
                                           (conv weight_orig [O,I,kh,kw] →
                                            HWIO; <k> = dense conv index)
  sn_state/main/<k> | sn_state/final/<k>   (power-iteration u vectors)

Torch optimizer/scheduler state is NOT converted (different pytree layout);
the engine re-initializes fresh optimizer slots.  The reference's
`nerf.progress` / `discriminator.progress` c2f parameters are dropped —
progress is a traced scalar here, driven by the step counter.

Usage:
  python tools/import_reference_ckpt.py <ref model.ckpt> <out.ckpt>

Load the result with any of:
  --init_weights=<out.ckpt>                (full overlay; evaluate or resume
                                            training with fresh optimizers)
  --resume_pretrain --pretrain_ckpt=<out>  (geometry trunk only,
                                            reference util.py:202-222)
  --resume_real --field_ckpt=<out>         (nerf field only, util.py:225-242)
"""

from __future__ import annotations

import re
import sys

import numpy as np


def convert_graph_state(graph):
    """Reference graph state_dict {key: np.ndarray} → {our keypath: array}."""
    out = {}
    linear = re.compile(
        r"^nerf\.(mlp_feat|mlp_rgb|mlp_trans)\.(\d+)\.(weight|bias)$")
    sn = re.compile(
        r"^discriminator\.(main|final)\.(\d+)\.(weight_orig|weight_u)$")
    disc_idx = {"main": {}, "final": {}}   # sparse Sequential j → dense k

    for grp in ("main", "final"):
        js = sorted({int(m.group(2)) for k in graph
                     if (m := sn.match(k)) and m.group(1) == grp})
        disc_idx[grp] = {j: k for k, j in enumerate(js)}

    for key, val in graph.items():
        arr = np.asarray(val)
        m = linear.match(key)
        if m:
            head, i, kind = m.group(1), int(m.group(2)), m.group(3)
            if kind == "weight":
                out[f"params/nerf/{head}/{i}/w"] = arr.T.copy()
            else:
                out[f"params/nerf/{head}/{i}/b"] = arr
            continue
        m = sn.match(key)
        if m:
            grp, j, kind = m.group(1), int(m.group(2)), m.group(3)
            k = disc_idx[grp][j]
            if kind == "weight_orig":
                # torch conv [out,in,kh,kw] → our HWIO [kh,kw,in,out]
                out[f"params/disc/{grp}/{k}/w"] = \
                    arr.transpose(2, 3, 1, 0).copy()
            else:
                out[f"sn_state/{grp}/{k}"] = arr
            continue
        if key == "latent_vars_trans.weight":
            out["latents/trans"] = arr
        elif key == "latent_vars_light.weight":
            out["latents/light"] = arr
        # dropped: *.progress (traced here), *.weight_v (recomputed),
        # anything else unknown is reported by the caller
    return out


def convert_checkpoint(ref_path, out_path):
    import torch
    try:
        ckpt = torch.load(ref_path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(ref_path, map_location="cpu", weights_only=False)
    graph = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
             for k, v in ckpt["graph"].items()}
    flat = convert_graph_state(graph)
    flat["step"] = np.int32(ckpt.get("iter") or 0)
    # honest report: which source keys were consumed / deliberately dropped
    lin = re.compile(r"^nerf\.(mlp_feat|mlp_rgb|mlp_trans)\.\d+\.(weight|bias)$")
    snr = re.compile(
        r"^discriminator\.(main|final)\.\d+\.(weight_orig|weight_u)$")
    dropped = re.compile(r"\.progress$|\.weight_v$|weight$")
    leftovers = [k for k in graph
                 if not (lin.match(k) or snr.match(k)
                         or k in ("latent_vars_trans.weight",
                                  "latent_vars_light.weight")
                         or dropped.search(k))]
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    import os
    os.replace(tmp, out_path)
    return flat, leftovers


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 2
    flat, leftovers = convert_checkpoint(argv[0], argv[1])
    n_param = sum(1 for k in flat if k != "step")
    print(f"wrote {argv[1]}: {n_param} leaves @ step {int(flat['step'])}")
    for k in leftovers:
        print(f"  NOTE: unconverted reference key: {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
