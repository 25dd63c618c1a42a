"""nanort_tpu.models"""
