"""Checkpoint save/restore + backbone extraction.

Replaces the reference's three formats (SURVEY.md §5.4):
  (a) Lightning .ckpt → orbax checkpoints of the full TrainState
  (b) backbone-only .pth with sha-suffix naming (extras.py:112-128) →
      ``extract_backbone`` + ``save_params_npz`` (sha256-named .npz)
  (c) upstream flax .npz / torch .pth → utils.flax_ckpt / utils.torch_pth
"""

from __future__ import annotations

import hashlib
import io
import os
from typing import Any

import numpy as np


def save_train_state(
    ckpt_dir: str, state: Any, step: int | None = None, meta: dict | None = None
) -> str:
    """Orbax save of {params, batch_stats, opt_state, step}.

    ``meta`` (plain JSON-able dict, e.g. {"grad_accum_steps": k}) is written
    alongside the checkpoint so that resume can fail loudly when the optimizer
    state structure depends on a config value that changed (the MultiSteps
    wrapper reshapes opt_state — an orbax template mismatch is opaque)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "step": state.step,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            },
            force=True,
        )
    if meta:
        import json

        with open(os.path.join(path, "vtt_meta.json"), "w") as f:
            json.dump(meta, f)
    return path


def restore_train_state(ckpt_path: str, state: Any, expect_meta: dict | None = None) -> Any:
    """Restore into an abstract TrainState built the same way as at save time.

    ``expect_meta`` asserts checkpoint metadata (see ``save_train_state``)
    before orbax touches the tree, turning structural mismatches (e.g. a
    changed ``train.grad_accum_steps``) into a clear error."""
    import orbax.checkpoint as ocp

    if expect_meta:
        import json

        meta_path = os.path.join(os.path.abspath(ckpt_path), "vtt_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                saved = json.load(f)
            for k, want in expect_meta.items():
                if k in saved and saved[k] != want:
                    raise ValueError(
                        f"checkpoint {ckpt_path} was saved with {k}={saved[k]} "
                        f"but the current config has {k}={want}; the optimizer "
                        f"state structure depends on it — resume with the same "
                        f"value (or restart without runtime.resume)"
                    )
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(ckpt_path), template)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def extract_backbone(variables: dict, backbone_name: str = "backbone") -> dict:
    """Strip the classifier head: keep only the backbone subtree of a
    classifier's variables (the reference strips the 'model.0.' prefix,
    extras.py:117-119)."""
    out = {}
    for col, tree in variables.items():
        if backbone_name in tree:
            out[col] = tree[backbone_name]
    return out


def flatten_tree(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(variables: dict, save_name: str, save_dir: str | None = None) -> str:
    """sha256-named .npz export of a variables tree (extras.py:121-128 naming:
    ``{name}-{sha256[:8]}.npz``)."""
    save_dir = save_dir or os.getcwd()
    flat = flatten_tree(variables)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    data = buf.getvalue()
    digest = hashlib.sha256(data).hexdigest()[:8]
    path = os.path.join(save_dir, f"{save_name}-{digest}.npz")
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_params_npz(path: str) -> dict:
    flat = dict(np.load(path).items())
    return unflatten_tree(flat)
