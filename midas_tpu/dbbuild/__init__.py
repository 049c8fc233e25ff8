from midas_tpu.dbbuild.build_db import run_build
from midas_tpu.dbbuild.cluster import greedy_cluster
