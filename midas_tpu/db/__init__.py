from midas_tpu.db.layout import Database, check_database
from midas_tpu.db.refpack import ReferencePack, build_pack
from midas_tpu.db.index import SeedIndex, build_seed_index
