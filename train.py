#!/usr/bin/env python
"""Root shim: reference-compatible `python train.py ...` entry point."""
import sys

from wavenet_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
