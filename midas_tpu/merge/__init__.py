from midas_tpu.merge.core import Sample, SpeciesGroup, select_species
