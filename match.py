#!/usr/bin/env python3
"""Drop-in entry point: `python match.py <reference-compatible flags>`.

Thin wrapper over mccnn_tpu.cli.match (see it for the flag surface).
"""

from mccnn_tpu.cli.match import main

if __name__ == "__main__":
    main()
