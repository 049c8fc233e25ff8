from midas_tpu.analyze.parse_snps import SnpMatrix, fetch_samples, fetch_sites
