"""Training checkpoints: params + optimizer state + epoch, resumable.

Replaces the reference's dual TF-Saver/npy-dict mechanisms
(reference: src/train.py:129,176-180 and src/model.py:67-85) with a single
flat-npz pytree snapshot, keeping the same contracts: periodic saves named
by epoch, ``max_to_keep`` retention, and restore-to-resume (including
momentum slots, which the TF checkpoints also carried).
"""

from __future__ import annotations

import os
import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np

_CKPT_RE = re.compile(r"model_epoch(\d+)\.npz$")


def checkpoint_path(directory: str, epoch: int) -> str:
    return os.path.join(directory, f"model_epoch{epoch}.npz")


def save_checkpoint(
    directory: str,
    epoch: int,
    params: Any,
    opt_state: Any = None,
    max_to_keep: int = 10,
) -> str:
    """Snapshot the (params, opt_state) pytrees; prune old checkpoints.

    Params are stored under NAMED keys (``params:conv{i}/w`` etc.) so a
    training checkpoint is directly loadable by ``models.params.load_any``
    (match/serve/eval take ``--resume model_epochN.npz``); momentum slots
    are stored as flattened ``opt_leaf_{i}`` entries for exact resume.
    """
    os.makedirs(directory, exist_ok=True)
    payload = {}
    for name, layer in params.items():
        for kind, value in layer.items():
            payload[f"params:{name}/{kind}"] = np.asarray(value)
    if opt_state is not None:
        leaves, _ = jax.tree.flatten(opt_state)
        for i, leaf in enumerate(leaves):
            payload[f"opt_leaf_{i}"] = np.asarray(leaf)
        payload["num_opt_leaves"] = np.asarray(len(leaves))
    path = checkpoint_path(directory, epoch)
    np.savez(path, **payload)
    _prune(directory, max_to_keep)
    return path


def _prune(directory: str, max_to_keep: int) -> None:
    found: List[Tuple[int, str]] = []
    for name in os.listdir(directory):
        match = _CKPT_RE.match(name)
        if match:
            found.append((int(match.group(1)), os.path.join(directory, name)))
    found.sort()
    for _, path in found[:-max_to_keep] if max_to_keep > 0 else []:
        os.remove(path)


def latest_checkpoint(directory: str) -> Optional[str]:
    best: Optional[Tuple[int, str]] = None
    if not os.path.isdir(directory):
        return None
    for name in os.listdir(directory):
        match = _CKPT_RE.match(name)
        if match:
            entry = (int(match.group(1)), os.path.join(directory, name))
            if best is None or entry[0] > best[0]:
                best = entry
    return best[1] if best else None


def epoch_of(path: str) -> int:
    match = _CKPT_RE.search(os.path.basename(path))
    if not match:
        raise ValueError(f"not a checkpoint path: {path}")
    return int(match.group(1))


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree snapshot into the structure of ``like``.

    ``like`` is the ``{"params": ..., "opt_state": ...}`` state template
    (opt_state optional). Reads both the named format written by
    ``save_checkpoint`` and the legacy all-``leaf_{i}`` flat format.
    """
    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        if any(k.startswith("params:") for k in data.files):
            state = dict(like)
            params: Any = {}
            for key in data.files:
                if not key.startswith("params:"):
                    continue
                name, _, kind = key[len("params:"):].partition("/")
                params.setdefault(name, {})[kind] = np.asarray(data[key])
            state["params"] = params
            if "opt_state" in state and state["opt_state"] is not None:
                opt_leaves, opt_def = jax.tree.flatten(state["opt_state"])
                has_opt = ("num_opt_leaves" in data.files
                           or "opt_leaf_0" in data.files)
                if opt_leaves and not has_opt:
                    raise ValueError(
                        f"checkpoint {path} carries no optimizer state "
                        "(saved with opt_state=None — weights only), but the "
                        "restore template expects one; resume with a fresh "
                        "optimizer (pass opt_state=None in `like`) or load "
                        "weights via models.params.load_params instead"
                    )
                if opt_leaves:
                    # count key written by save_checkpoint; tolerate archives
                    # that carry opt_leaf_* without it by counting the keys
                    saved = (int(data["num_opt_leaves"])
                             if "num_opt_leaves" in data.files else
                             sum(k.startswith("opt_leaf_")
                                 for k in data.files))
                    if saved != len(opt_leaves):
                        raise ValueError(
                            f"checkpoint {path} has {saved} optimizer leaves "
                            f"but the restore template expects "
                            f"{len(opt_leaves)} (different optimizer?)"
                        )
                restored_opt = [
                    np.asarray(data[f"opt_leaf_{i}"])
                    for i in range(len(opt_leaves))
                ]
                state["opt_state"] = jax.tree.unflatten(opt_def, restored_opt)
            restored = jax.tree.flatten(state)[0]
        else:  # legacy: one flat leaf list over the whole state dict
            restored = [
                np.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
            ]
    for old, new in zip(leaves, restored):
        if np.shape(old) != np.shape(new):
            raise ValueError(
                f"checkpoint leaf shape {np.shape(new)} != expected {np.shape(old)}"
            )
    return jax.tree.unflatten(treedef, restored)
