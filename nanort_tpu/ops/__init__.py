"""nanort_tpu.ops"""
