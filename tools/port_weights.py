"""Port torch pretrained weights to the npz layouts texpose_tpu loads.

Run on any machine with torchvision / lpips weights available, then copy the
.npz files to the training host and point configs at them
(cfg.vgg_weights, cfg.lpips_weights).

    python tools/port_weights.py vgg19 --out vgg19_feat14.npz
    python tools/port_weights.py lpips_alex --out lpips_alex.npz

torchvision-free path: if you only have a raw state-dict file (e.g. the
torchvision download vgg19-dcbb9e9d.pth fetched out-of-band), pass it via
--state_dict — only torch (CPU) is needed to unpickle:

    python tools/port_weights.py vgg19 --state_dict vgg19-dcbb9e9d.pth \\
        --out vgg19_feat14.npz

vgg19 output keys:   features.N.{weight,bias} for N in conv indices ≤14
                     (torch OIHW layout; consumed by nn/vgg.py:load_vgg19_npz)
lpips output keys:   convN.{weight,bias} (AlexNet features convs, OIHW) and
                     linN.weight (LPIPS linear calibration, [1,C,1,1])
                     (consumed by nn/lpips.py:load_lpips_npz)
"""

import argparse

import numpy as np


def port_vgg19(out, state_dict=None):
    if state_dict:
        import torch
        sd = torch.load(state_dict, map_location="cpu", weights_only=True)
        # accept either a full-model state dict (features.N.*) or a
        # features-only one (N.*)
        sd = {(k[len("features."):] if k.startswith("features.") else k): v
              for k, v in sd.items()}
    else:
        import torchvision
        net = torchvision.models.vgg19(weights="IMAGENET1K_V1")
        sd = net.features.state_dict()
    keep = {}
    for idx in (0, 2, 5, 7, 10, 12, 14):
        keep[f"features.{idx}.weight"] = np.asarray(sd[f"{idx}.weight"])
        keep[f"features.{idx}.bias"] = np.asarray(sd[f"{idx}.bias"])
    np.savez(out, **keep)
    print(f"wrote {out} ({len(keep)} arrays)")


def port_lpips_alex(out):
    import lpips as lpips_pkg
    net = lpips_pkg.LPIPS(net="alex")
    alex = net.net  # alexnet slices
    convs = []
    for mod in alex.modules():
        import torch.nn as nn
        if isinstance(mod, nn.Conv2d):
            convs.append(mod)
    keep = {}
    for i, c in enumerate(convs[:5]):
        keep[f"conv{i}.weight"] = c.weight.detach().numpy()
        keep[f"conv{i}.bias"] = c.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        keep[f"lin{i}.weight"] = lin.model[-1].weight.detach().numpy()
    np.savez(out, **keep)
    print(f"wrote {out} ({len(keep)} arrays)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("which", choices=["vgg19", "lpips_alex"])
    p.add_argument("--out", required=True)
    p.add_argument("--state_dict", default=None,
                   help="raw torch .pth state dict (torchvision-free path)")
    a = p.parse_args()
    if a.which == "vgg19":
        port_vgg19(a.out, state_dict=a.state_dict)
    else:
        port_lpips_alex(a.out)
