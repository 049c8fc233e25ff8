#!/usr/bin/env python
"""Reference-compatible shim: scripts/strain_tracking.py -> midas_tpu.cli.analysis"""
import sys
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from midas_tpu.cli.analysis import strain_tracking_main
if __name__ == "__main__":
    sys.exit(strain_tracking_main())
