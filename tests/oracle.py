"""Golden-output oracle: builds and runs the reference gmapper binary.

The reference tree at /root/reference is copied to /tmp and compiled once;
tests diff our SAM output against it. If the toolchain or reference is
unavailable, oracle-based tests are skipped.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional

REF_SRC = "/root/reference"
BUILD_DIR = "/tmp/refbuild"
GMAPPER = os.path.join(BUILD_DIR, "bin", "gmapper")


def ensure_gmapper() -> Optional[str]:
    if os.path.exists(GMAPPER):
        return GMAPPER
    if not os.path.isdir(REF_SRC):
        return None
    try:
        if not os.path.isdir(BUILD_DIR):
            shutil.copytree(REF_SRC, BUILD_DIR)
        subprocess.run(["make", "bin/gmapper", "-j8"], cwd=BUILD_DIR,
                       check=True, capture_output=True, timeout=600)
    except Exception:
        return None
    return GMAPPER if os.path.exists(GMAPPER) else None


def run_gmapper(args: List[str], mode: str = "ls") -> str:
    gm = ensure_gmapper()
    assert gm is not None
    argv0 = gm + "-" + mode
    res = subprocess.run([argv0] + args, capture_output=True, text=True,
                         timeout=600)
    if res.returncode != 0:
        raise RuntimeError(f"gmapper failed: {res.stderr[-2000:]}")
    return res.stdout


def sam_body(text: str) -> List[str]:
    """Alignment lines only (headers carry version/cmdline noise)."""
    return [l for l in text.splitlines() if l and not l.startswith("@")]
