"""Checkpointing: pytree save/restore with the reference's partial-restore
modes.

Capability parity with /root/reference/util.py:172-263:
  * save {step, params, opt_state, extras} → <output>/model.ckpt plus
    numbered copies <output>/model/<it>.ckpt
  * full restore (resume)
  * `restore_trunk`: load ONLY the geometry trunk (mlp_feat) from a
    group-level pretrain checkpoint (util.py:202-222, --resume_pretrain)
  * `restore_field`: load only the nerf field subtree (util.py:225-242,
    --resume_real)

Format: a single .npz of flattened tree leaves keyed by their key-path
("params/nerf/mlp_feat/0/w", ...) — no pickling, portable across hosts, and
loadable leaf-by-leaf for the partial modes.  Optimizer state is saved the
same way; restore rebuilds against a template pytree (shapes must match).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp


SEP = "/"


def _key_str(k):
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    if isinstance(k, jax.tree_util.FlattenedIndexKey):
        return str(k.key)
    return str(k)


def tree_to_flat_dict(tree, prefix=""):
    """Pytree → {keypath: np.ndarray}."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        key = SEP.join([prefix] * bool(prefix) + [_key_str(k) for k in path])
        out[key] = np.asarray(leaf)
    return out


def flat_dict_to_tree(template, flat, prefix="", strict=True):
    """Rebuild a pytree shaped like `template` from {keypath: array}.

    With strict=False, leaves missing from `flat` keep the template value
    (used by the partial-restore modes).
    """
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = SEP.join([prefix] * bool(prefix) + [_key_str(k) for k in path])
        if key in flat:
            arr = flat[key]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {arr.shape} vs "
                    f"template {leaf.shape}")
            if hasattr(leaf, "dtype"):
                leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
            else:
                leaves.append(arr.item() if arr.ndim == 0 else arr)
        elif strict:
            raise KeyError(f"checkpoint missing leaf: {key}")
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(output_path, state, it=None, keep_numbered=False):
    """state: pytree dict (e.g. {step, params, opt_state, ...}) →
    <output_path>/model.ckpt (.npz).  With keep_numbered, also copy to
    <output_path>/model/<it>.ckpt (reference util.py:244-263)."""
    os.makedirs(output_path, exist_ok=True)
    flat = tree_to_flat_dict(state)
    fname = os.path.join(output_path, "model.ckpt")
    tmp = fname + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, fname)
    if keep_numbered and it is not None:
        d = os.path.join(output_path, "model")
        os.makedirs(d, exist_ok=True)
        shutil.copyfile(fname, os.path.join(d, f"{it}.ckpt"))
    return fname


def load_checkpoint_flat(fname):
    """→ {keypath: np.ndarray}."""
    with np.load(fname, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def restore_checkpoint(fname, template):
    """Full restore of a state pytree saved by save_checkpoint."""
    return flat_dict_to_tree(template, load_checkpoint_flat(fname))


def restore_subtree(fname, params_template, subtree_key,
                    ckpt_prefix="params"):
    """Load only leaves under `<ckpt_prefix>/.../<subtree_key>/...` into a
    params pytree, keeping everything else from the template.

    restore_subtree(f, params, "mlp_feat") == the reference's
    restore_pretrain_partial_checkpoint (util.py:202-222);
    restore_subtree(f, params, "nerf") == restore_pretrain_nerf
    (util.py:225-242).
    """
    flat_ckpt = load_checkpoint_flat(fname)
    token = SEP + subtree_key + SEP
    paths, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    n_hit = 0
    for path, leaf in paths:
        key = SEP.join([ckpt_prefix] + [_key_str(k) for k in path])
        if token in SEP + key + SEP and key in flat_ckpt:
            arr = flat_ckpt[key]
            if tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {arr.shape} vs "
                    f"template {leaf.shape}")
            leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
            n_hit += 1
        else:
            leaves.append(leaf)
    if n_hit == 0:
        raise KeyError(
            f"no leaves under subtree {subtree_key!r} found in {fname}")
    return jax.tree_util.tree_unflatten(treedef, leaves), n_hit


def merge_flat_into_tree(template, flat):
    """Overlay {keypath: array} onto a state pytree: leaves present in
    `flat` (matching shape) replace the template's; everything else keeps
    the template value.  → (tree, n_loaded, skipped_keys).

    Backs cfg.init_weights (imported/partial checkpoints, e.g.
    tools/import_reference_ckpt.py output): unlike restore_checkpoint it
    tolerates missing leaves (fresh optimizer state) and unlike
    restore_subtree it loads every matching leaf, not one subtree.  Shape
    mismatches are skipped and reported, not fatal — a reference texture
    ckpt's latent tables only fit when N_train matches."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    n_hit = 0
    skipped = []
    for path, leaf in paths:
        key = SEP.join(_key_str(k) for k in path)
        arr = flat.get(key)
        if arr is None:
            leaves.append(leaf)
        elif (hasattr(leaf, "shape")
              and tuple(arr.shape) != tuple(leaf.shape)):
            skipped.append(f"{key}: ckpt {arr.shape} vs {leaf.shape}")
            leaves.append(leaf)
        else:
            if hasattr(leaf, "dtype"):
                leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
            else:
                leaves.append(arr.item() if arr.ndim == 0 else arr)
            n_hit += 1
    return jax.tree_util.tree_unflatten(treedef, leaves), n_hit, skipped
