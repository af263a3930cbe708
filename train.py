#!/usr/bin/env python
"""Train entry (reference: per-variant train.py).  Seeds are fixed by Config.

  python train.py --variant unit_cost [--smoke] [--resume]
"""
import sys

from mdcommunity_tpu.cli import main

if __name__ == "__main__":
    main(["train"] + sys.argv[1:])
