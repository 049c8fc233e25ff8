#!/usr/bin/env python
"""Reference-compatible shim: scripts/snp_diversity.py -> midas_tpu.cli.analysis"""
import sys
from midas_tpu.cli.analysis import snp_diversity_main
if __name__ == "__main__":
    sys.exit(snp_diversity_main())
