"""Thin wrapper so `python scripts/hsc_codec.py` keeps working from a
checkout; the CLI itself lives in `hsc_tpu.cli` (installed as `hsc-codec`).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hsc_tpu.cli import main

if __name__ == "__main__":
    main()
