"""tpuseg.ops.pallas — TPU Pallas kernels."""
