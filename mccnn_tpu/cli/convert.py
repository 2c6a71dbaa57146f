"""Weight-format converter CLI.

Brings weights from either reference format — TF1 Saver checkpoints
(e.g. the shipped ``model_epoch2000.ckpt``) or the npy dict
(reference: src/model.py:67-85) — into the native flat-npz format, and back
out to the npy dict for reference interop.
"""

from __future__ import annotations

import argparse

from mccnn_tpu.models.params import (
    load_any,
    save_params,
    save_reference_npy_dict,
)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="convert MC-CNN weights between formats"
    )
    parser.add_argument("source", help="input: .npz, .npy dict, or TF ckpt prefix")
    parser.add_argument("dest", help="output: .npz or .npy")
    args = parser.parse_args(argv)

    params = load_any(args.source)
    if args.dest.endswith(".npy"):
        save_reference_npy_dict(params, args.dest)
    elif args.dest.endswith(".npz"):
        save_params(params, args.dest)
    else:
        raise SystemExit("destination must end in .npz or .npy")
    layers = ", ".join(
        f"{name}:{tuple(layer['w'].shape)}" for name, layer in sorted(params.items())
    )
    print(f"converted {args.source} -> {args.dest} ({layers})")


if __name__ == "__main__":
    main()
