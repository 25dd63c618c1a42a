"""nanort_tpu.traverse"""
