"""Hand-written TPU kernels (Pallas) for the hot ops."""
