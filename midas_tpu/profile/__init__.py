from midas_tpu.profile.species import SpeciesProfiler, run_species, select_species, read_abundance
