#!/usr/bin/env python
"""Synthetic sweep entry (reference: testSynthetic.py).

  python testSynthetic.py --model CKPT [--sizes 32 64 128 ...]
"""
import sys

from mdcommunity_tpu.cli import main

if __name__ == "__main__":
    main(["test-synthetic"] + sys.argv[1:])
