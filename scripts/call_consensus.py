#!/usr/bin/env python
"""Reference-compatible shim: scripts/call_consensus.py -> midas_tpu.cli.analysis"""
import sys
from midas_tpu.cli.analysis import call_consensus_main
if __name__ == "__main__":
    sys.exit(call_consensus_main())
