"""Multi-object fleet training launcher.

The reference trains one object per invocation on one GPU
(options.py:112-113).  TPU deployments train the 13-object LineMOD fleet as
a set of independent per-object runs (each object owns its own radiance
field — there is nothing to share across objects), placed one object per
slice / replica group:

  * single host (this launcher): objects run as sequential or parallel
    subprocesses, each a full train.py invocation with its own output dir.
  * multi-slice pods: launch one process group per slice with
    JAX_COORDINATOR/process-id env vars (jax.distributed.initialize inside
    train.py picks them up via cfg.mesh) — collectives for a single object
    stay on that slice's ICI; nothing crosses DCN.

Usage:
    python train_fleet.py --yaml=configs/nerf_lm_adapt_gan.yaml \
        --objects=duck,cat,ape --group=LM [--parallel=2] [-- extra train args]
"""

import argparse
import os
import subprocess
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = []
    if "--" in argv:
        i = argv.index("--")
        argv, extra = argv[:i], argv[i + 1:]
    p = argparse.ArgumentParser()
    p.add_argument("--yaml", required=True)
    p.add_argument("--objects", required=True,
                   help="comma-separated object names")
    p.add_argument("--group", default="fleet")
    p.add_argument("--parallel", type=int, default=1,
                   help="concurrent runs (keep 1 per accelerator)")
    p.add_argument("--retries", type=int, default=0,
                   help="failure recovery: relaunch a crashed run with "
                        "--resume up to N times (checkpoints make restarts "
                        "cheap; the reference has no recovery story at all)")
    a = p.parse_args(argv)

    objects = [o for o in a.objects.split(",") if o]
    procs, results, attempts = [], {}, {}

    def launch(obj, resume=False):
        cmd = [sys.executable, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "train.py"),
            f"--yaml={a.yaml}", f"--data.object={obj}",
            f"--group={a.group}", f"--name={obj}"] + extra
        if resume:
            cmd.append("--resume")
        print(f"[fleet] launching {obj}: {' '.join(cmd)}", flush=True)
        return obj, subprocess.Popen(cmd)

    queue = objects[:]
    while queue or procs:
        while queue and len(procs) < a.parallel:
            obj = queue.pop(0)
            procs.append(launch(obj, resume=attempts.get(obj, 0) > 0))
        obj, pr = procs.pop(0)
        rc = pr.wait()
        print(f"[fleet] {obj} exited with {rc}", flush=True)
        if rc != 0 and attempts.get(obj, 0) < a.retries:
            attempts[obj] = attempts.get(obj, 0) + 1
            print(f"[fleet] retrying {obj} with --resume "
                  f"(attempt {attempts[obj]}/{a.retries})", flush=True)
            queue.append(obj)
        else:
            results[obj] = rc

    failed = {k: v for k, v in results.items() if v != 0}
    if failed:
        print(f"[fleet] FAILED: {failed}", flush=True)
        sys.exit(1)
    print(f"[fleet] all {len(results)} objects done", flush=True)


if __name__ == "__main__":
    main()
