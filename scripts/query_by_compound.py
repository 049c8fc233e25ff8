#!/usr/bin/env python
"""Reference-compatible shim: scripts/query_by_compound.py -> midas_tpu.cli.analysis"""
import sys
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from midas_tpu.cli.analysis import query_by_compound_main
if __name__ == "__main__":
    sys.exit(query_by_compound_main())
