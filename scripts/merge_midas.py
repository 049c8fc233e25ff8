#!/usr/bin/env python
"""Reference-compatible shim: scripts/merge_midas.py -> midas_tpu.cli.merge_midas"""
import sys
from midas_tpu.cli.merge_midas import main
if __name__ == "__main__":
    sys.exit(main())
