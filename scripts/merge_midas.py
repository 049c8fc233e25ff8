#!/usr/bin/env python
"""Reference-compatible shim: scripts/merge_midas.py -> midas_tpu.cli.merge_midas"""
import sys
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from midas_tpu.cli.merge_midas import main
if __name__ == "__main__":
    sys.exit(main())
