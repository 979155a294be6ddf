"""Build libsocio_host.so (plain g++, no deps). Invoked by `make native`;
also triggered lazily by socioreasoner_tpu.utils.native on first import."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "socio_host.cpp")
OUT = os.path.join(HERE, "libsocio_host.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           SRC, "-o", OUT]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
