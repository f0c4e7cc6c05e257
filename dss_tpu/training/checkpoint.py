"""Checkpoint / resume.

Reference: DSS/misc/checkpoints.py `CheckpointIO` (9-121): save registered
module state_dicts + scalar kwargs, partial restore with warnings, best-model
backups.  Here a train-state pytree is flattened to a single .npz (atomic
write) — no pickle, no framework lock-in; partial restore keys are matched by
path name.
"""
from __future__ import annotations

import os
import shutil
import tempfile
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten_with_paths(tree) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))
            for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


class CheckpointIO:
    """Save/load pytrees + scalars to `<out_dir>/<name>.npz`."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def save(self, filename: str, tree, **scalars) -> str:
        path = os.path.join(self.out_dir, filename)
        flat = _flatten_with_paths(tree)
        for k, v in scalars.items():
            flat["__scalar__/" + k] = np.asarray(v)
        fd, tmp = tempfile.mkstemp(dir=self.out_dir, suffix=".tmp")
        os.close(fd)
        try:
            np.savez(tmp, **flat)
            # np.savez appends .npz to the filename it opens
            os.replace(tmp + ".npz", path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return path

    def load(self, filename: str, tree_template):
        """Restore into the template pytree structure; missing keys keep the
        template's value (partial restore, reference checkpoints.py:55-121).
        Returns (tree, scalars dict)."""
        path = os.path.join(self.out_dir, filename)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        data = np.load(path, allow_pickle=False)
        scalars = {
            k.split("/", 1)[1]: data[k].item()
            for k in data.files
            if k.startswith("__scalar__/")
        }

        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree_template)
        new_leaves = []
        missing = []
        for path_t, leaf in paths_leaves:
            key = "/".join(
                str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))
                for p in path_t
            )
            if key in data.files:
                new_leaves.append(
                    np.asarray(data[key], dtype=np.asarray(leaf).dtype)
                )
            else:
                missing.append(key)
                new_leaves.append(leaf)
        if missing:
            print("CheckpointIO: missing keys kept from template:", missing[:8])
        return jax.tree_util.tree_unflatten(treedef, new_leaves), scalars

    def backup_best(self, filename: str) -> Optional[str]:
        """Timestamped copy of the best checkpoint (reference
        checkpoints.py:43-53)."""
        src = os.path.join(self.out_dir, filename)
        if not os.path.exists(src):
            return None
        ts = time.strftime("%Y%m%d%H%M%S")
        dst = os.path.join(self.out_dir, f"backup_{ts}_{filename}")
        shutil.copyfile(src, dst)
        return dst
