from midas_tpu.align.params import ScoringParams, MARKER_SCORING, GLOBAL_SCORING, LOCAL_SCORING
from midas_tpu.align.oracle import align_oracle, OracleAlignment
