"""nanort_tpu.api"""
