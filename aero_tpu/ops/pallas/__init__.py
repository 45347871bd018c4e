"""Pallas TPU kernels for the hot sequential ops XLA can't pipeline well."""
