"""nanort_tpu.io"""
