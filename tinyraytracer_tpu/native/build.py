"""Build libtinyrt.so: `python -m tinyraytracer_tpu.native.build`.

One translation unit, g++ -O3, links zlib for the PNG encoder. The library
is optional at runtime — every entry point has a pure-Python fallback
(native/runtime.py docstring) — so a build failure degrades, not breaks.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src", "tinyrt.cpp")
OUT = os.path.join(HERE, "libtinyrt.so")


def build(verbose: bool = True) -> bool:
    cmd = [
        "g++",
        "-std=c++17",
        "-O3",
        "-fPIC",
        "-shared",
        "-o",
        OUT,
        SRC,
        "-lz",
    ]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed: {e}", file=sys.stderr)
        return False
    return True


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
