#!/usr/bin/env python
"""Reference-compatible shim: scripts/compare_genes.py -> midas_tpu.cli.analysis"""
import sys
from midas_tpu.cli.analysis import compare_genes_main
if __name__ == "__main__":
    sys.exit(compare_genes_main())
