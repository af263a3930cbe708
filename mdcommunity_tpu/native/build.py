"""Build the native engine (g++ -O3 shared lib). Importable and runnable:

    python -m mdcommunity_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "src", "mdc_native.cpp")
LIB = os.path.join(_HERE, "libmdc_native.so")


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-march=native",
        "-o",
        LIB,
        SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
