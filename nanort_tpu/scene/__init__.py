"""nanort_tpu.scene"""
