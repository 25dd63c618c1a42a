"""nanort_tpu.core"""
