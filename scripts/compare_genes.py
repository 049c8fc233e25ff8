#!/usr/bin/env python
"""Reference-compatible shim: scripts/compare_genes.py -> midas_tpu.cli.analysis"""
import sys
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from midas_tpu.cli.analysis import compare_genes_main
if __name__ == "__main__":
    sys.exit(compare_genes_main())
