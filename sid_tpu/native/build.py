"""Build libsidtpu.so with g++ (single translation unit, no dependencies)."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "parser.cpp")
OUT = os.path.join(HERE, "libsidtpu.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        # per-operation IEEE semantics: -march=native defaults to
        # -ffp-contract=fast, and FMA-contracted mul-adds round differently
        # from the numpy/oracle compositions the kernels must match bitwise
        "-ffp-contract=off",
        "-march=native", "-o", OUT, SRC,
    ]
    if verbose:
        print("+ " + " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
