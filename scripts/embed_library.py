"""Embed a compiled subcircuit library into the package (the reference's
release-build embedding step, `libs/build-support/subcircuit_library.rs`).

Usage: python scripts/embed_library.py /path/to/subcircuits/library
Copies setupParams.json, subcircuitInfo.json, globalWireList.json and the
r1cs/ binaries into tokamak_zk_evm_tpu/data/subcircuit_library/.
"""

import os
import shutil
import sys


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    src = sys.argv[1]
    if not os.path.isfile(os.path.join(src, "setupParams.json")):
        raise SystemExit(f"{src} has no setupParams.json")
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tokamak_zk_evm_tpu", "data", "subcircuit_library",
    )
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s = os.path.join(src, name)
        d = os.path.join(dst, name)
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copy2(s, d)
    print(f"embedded library -> {dst}")


if __name__ == "__main__":
    main()
