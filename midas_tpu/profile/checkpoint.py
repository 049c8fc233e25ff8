"""Accumulator checkpoints: stage resume + crash recovery.

The reference resumes at stage granularity through persisted
intermediates (temp/pangenomes.bam etc., scripts/run_midas.py:506-604).
Our accumulators are plain arrays, so checkpointing is much cheaper
than a BAM: a sliced host snapshot of the device state (see
device_steps.{species,genes,snps}_state_host) plus the stream position,
written atomically every N batches and at end of stream. A rerun with
the same inputs/params restores the state, skips the consumed batches
(the read stream is deterministic), and produces byte-identical output.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


def fingerprint(**kw) -> str:
    """Stable digest of everything that must match for a checkpoint to
    be resumable: read paths + params + batch geometry."""
    import hashlib

    blob = json.dumps(kw, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save(path: str, arrays: Dict[str, np.ndarray], meta: Dict) -> None:
    """Atomic save: write sibling tmp, fsync, rename."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, __meta__=json.dumps(meta), **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_any(path: str) -> Optional[Tuple[Dict[str, np.ndarray], Dict]]:
    """Load a checkpoint regardless of fingerprint (stage-split
    consumers trust the file the way the reference trusts an existing
    temp/*.bam); None if missing/corrupt."""
    if not os.path.isfile(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            arrays = {k: z[k] for k in z.files if k != "__meta__"}
        return arrays, meta
    except Exception:
        return None


def load(path: str, expect_fingerprint: str
         ) -> Optional[Tuple[Dict[str, np.ndarray], Dict]]:
    """Load a checkpoint if present and its fingerprint matches;
    otherwise None (corrupt/partial/mismatched checkpoints are ignored,
    the run just starts over)."""
    got = load_any(path)
    if got is None or got[1].get("fingerprint") != expect_fingerprint:
        return None
    return got
