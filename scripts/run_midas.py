#!/usr/bin/env python
"""Reference-compatible shim: scripts/run_midas.py -> midas_tpu.cli.run_midas"""
import sys
from midas_tpu.cli.run_midas import main
if __name__ == "__main__":
    sys.exit(main())
