"""Build the native host library (librocjpeg_host.so).

Usage: python csrc/build.py
The library is placed next to rocjpeg_tpu/runtime/native.py, which also
attempts this build automatically on first import if g++ is available.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "rocjpeg_tpu", "runtime", "librocjpeg_host.so")
SRC = os.path.join(HERE, "rocjpeg_entropy.cpp")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-fno-exceptions",
        SRC, "-o", OUT,
    ]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build()
    print("built", path)
    sys.exit(0)
