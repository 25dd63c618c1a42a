"""nanort_tpu.build"""
