"""Parameter persistence and converters from both reference weight formats.

The reference stores weights two ways: TF1 ``Saver`` checkpoints
(reference: src/train.py:129,176-180) and an npy dict keyed by TF variable
names like ``conv1/weights:0`` (reference: src/model.py:67-85). We persist a
flat ``.npz`` natively and convert from both reference formats so a user of
the reference can bring their trained model along (e.g. the shipped
``model_epoch2000.ckpt``).
"""

from __future__ import annotations

import re


import numpy as np

from mccnn_tpu.models.net import Params


def save_params(params: Params, path: str) -> None:
    """Save a params pytree as a flat npz (keys ``conv{i}/w``, ``conv{i}/b``)."""
    flat = {}
    for name, layer in params.items():
        flat[f"{name}/w"] = np.asarray(layer["w"])
        flat[f"{name}/b"] = np.asarray(layer["b"])
    np.savez(path, **flat)


def load_params(path: str) -> Params:
    """Load a params pytree from any of our npz layouts.

    Three on-disk layouts map to the same pytree: ``save_params`` output
    (``conv{i}/w`` keys), training checkpoints from
    ``utils.checkpoint.save_checkpoint`` (``params:conv{i}/w`` keys plus
    ``opt_leaf_{i}`` momentum slots, which are ignored here), and legacy
    flat training snapshots (anonymous ``leaf_{i}`` keys — the momentum
    half mirrors the params half shape-for-shape, so the params are the
    second half; biases are 1-D, kernels 4-D, in sorted layer order).
    """
    with np.load(path) as data:
        params: Params = {}
        if any(k.startswith("params:") for k in data.files):
            for key in data.files:
                if not key.startswith("params:"):
                    continue
                name, _, kind = key[len("params:"):].partition("/")
                params.setdefault(name, {})[kind] = np.asarray(data[key])
        elif any(k.startswith("leaf_") for k in data.files):
            params = _params_from_legacy_leaves(data)
        else:
            for key in data.files:
                name, _, kind = key.partition("/")
                params.setdefault(name, {})[kind] = np.asarray(data[key])
    _validate(params)
    return params


def _params_from_legacy_leaves(data) -> Params:
    """Reconstruct params from a legacy flat ``leaf_{i}`` training snapshot.

    The legacy writer flattened ``{"opt_state": ..., "params": ...}``
    (dict keys in sorted order, so momentum leaves come FIRST and mirror
    the params leaves shape-for-shape) or just ``{"params": ...}``. Params
    flatten as (b, w) pairs per layer in sorted layer-name order
    ("conv1" < "conv10" < "conv2").

    The mirror detection is heuristic by nature (the format is anonymous):
    a 2-way shape mirror is momentum+params (drop the first half); a 3-way
    mirror is a non-momentum optimizer (e.g. adam) whose slots would parse
    into plausible-but-wrong layers, so it raises. A params-only net whose
    layers ALL have identical shapes (including conv1) could trip either
    test — use the named formats for anything beyond the reference nets.
    """
    n = int(data["num_leaves"]) if "num_leaves" in data.files else len(
        [k for k in data.files if k.startswith("leaf_")]
    )
    leaves = [np.asarray(data[f"leaf_{i}"]) for i in range(n)]

    def mirrors(k: int) -> bool:
        """All k equal-length parts shape-identical (a k-way state mirror)."""
        part = n // k
        return n % k == 0 and part > 0 and all(
            leaves[j].shape == leaves[(k - 1) * part + j].shape
            for j in range(part)
        ) and all(
            leaves[j].shape == leaves[p * part + j].shape
            for p in range(1, k - 1) for j in range(part)
        )

    if mirrors(3):
        # three mirrored blocks (e.g. adam mu/nu + params) would otherwise
        # parse leaf-pairwise into plausible-but-garbage conv layers
        raise ValueError(
            "legacy snapshot has a 3-way mirrored leaf layout (non-momentum "
            "optimizer state?); cannot identify the params half — re-save "
            "with utils.checkpoint.save_checkpoint (named keys)"
        )
    if mirrors(2):
        leaves = leaves[n // 2:]  # drop the momentum mirror
    if len(leaves) % 2:
        raise ValueError(f"cannot split {len(leaves)} leaves into (b, w) pairs")
    num_layers = len(leaves) // 2
    # the legacy writer flattened params with dict keys in SORTED STRING
    # order ("conv1" < "conv10" < "conv2" ...), so pair j belongs to the
    # j-th name in sorted order — not to conv{j+1}
    names = sorted(f"conv{i + 1}" for i in range(num_layers))
    params: Params = {}
    for i in range(0, len(leaves), 2):
        b, w = leaves[i], leaves[i + 1]
        if b.ndim != 1 or w.ndim != 4:
            raise ValueError(
                f"legacy leaf pair {i // 2} has shapes {b.shape}/{w.shape}, "
                "expected 1-D bias + 4-D kernel"
            )
        params[names[i // 2]] = {"b": b, "w": w}
    return params


def load_reference_npy_dict(path: str) -> Params:
    """Convert the reference's npy weight dict (reference: src/model.py:67-76).

    Keys look like ``conv1/weights:0`` / ``conv1/biases:0``; values are
    HWIO conv kernels and bias vectors — the layouts match ours directly.
    """
    weights_dict = np.load(path, encoding="bytes", allow_pickle=True).item()
    params: Params = {}
    for raw_key, value in weights_dict.items():
        key = raw_key.decode() if isinstance(raw_key, bytes) else str(raw_key)
        match = re.match(r"(conv\d+)/(weights|biases)(:0)?$", key)
        if match is None:
            continue
        name, kind = match.group(1), match.group(2)
        params.setdefault(name, {})["w" if kind == "weights" else "b"] = np.asarray(
            value, dtype=np.float32
        )
    _validate(params)
    return params


def save_reference_npy_dict(params: Params, path: str) -> None:
    """Export to the reference's npy dict format (round-trip compatibility)."""
    weights_dict = {}
    for name, layer in params.items():
        weights_dict[f"{name}/weights:0"] = np.asarray(layer["w"])
        weights_dict[f"{name}/biases:0"] = np.asarray(layer["b"])
    np.save(path, weights_dict)


def load_tf_checkpoint(path: str) -> Params:
    """Convert a reference TF1 ``Saver`` checkpoint (e.g. model_epoch2000.ckpt).

    Variables are named ``conv{i}/weights`` / ``conv{i}/biases`` (plus
    Momentum slots, skipped). Requires tensorflow in the environment; we only
    touch the checkpoint *reader*, no graph/session.
    """
    try:
        from tensorflow.python.training import py_checkpoint_reader
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "converting TF checkpoints requires tensorflow; "
            "use load_reference_npy_dict or native npz checkpoints instead"
        ) from exc

    reader = py_checkpoint_reader.NewCheckpointReader(path)
    params: Params = {}
    for key in reader.get_variable_to_shape_map():
        match = re.match(r"(conv\d+)/(weights|biases)$", key)
        if match is None:
            continue
        name, kind = match.group(1), match.group(2)
        params.setdefault(name, {})["w" if kind == "weights" else "b"] = np.asarray(
            reader.get_tensor(key), dtype=np.float32
        )
    _validate(params)
    return params


def load_any(path: str) -> Params:
    """Load weights from any supported format, sniffed from the path."""
    if path.endswith(".npz"):
        return load_params(path)
    if path.endswith(".npy"):
        return load_reference_npy_dict(path)
    return load_tf_checkpoint(path)


def _validate(params: Params) -> None:
    if not params:
        raise ValueError("no conv layers found in weight file")
    layer_ids = sorted(int(n[4:]) for n in params)
    expected = list(range(1, len(layer_ids) + 1))
    if layer_ids != expected:
        raise ValueError(f"non-contiguous conv layers: {layer_ids}")
    for name, layer in params.items():
        if "w" not in layer or "b" not in layer:
            raise ValueError(f"layer {name} missing weights or biases")
