"""Import the read-only reference implementation as a parity oracle.

Nothing from `/root/reference` is copied into this repo — tests import the
mounted reference package directly and compare numerical outputs. Tests using
this module must skip when the mount is absent.
"""

import sys
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def available() -> bool:
    return (REFERENCE_ROOT / "modules").exists()


def add_reference_paths():
    for p in (str(REFERENCE_ROOT), str(REFERENCE_ROOT / "utils" / "vocoder"),
              str(REFERENCE_ROOT / "utils" / "aligner")):
        if p not in sys.path:
            sys.path.append(p)
