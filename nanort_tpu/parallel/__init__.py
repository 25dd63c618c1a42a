"""nanort_tpu.parallel"""
