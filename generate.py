#!/usr/bin/env python
"""Root shim: reference-compatible `python generate.py ...` entry point."""
import sys

from wavenet_tpu.cli.generate import main

if __name__ == "__main__":
    sys.exit(main())
