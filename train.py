#!/usr/bin/env python3
"""Drop-in entry point: `python train.py <reference-compatible flags>`.

Thin wrapper over mccnn_tpu.cli.train (see it for the flag surface).
"""

from mccnn_tpu.cli.train import main

if __name__ == "__main__":
    main()
