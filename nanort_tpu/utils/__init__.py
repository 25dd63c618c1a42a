"""nanort_tpu.utils"""
