#!/usr/bin/env python
"""Real-network eval entry (reference: testReal.py).

  python testReal.py --model CKPT --data DATA_DIR -o OUT_DIR
"""
import sys

from mdcommunity_tpu.cli import main

if __name__ == "__main__":
    main(["test-real"] + sys.argv[1:])
