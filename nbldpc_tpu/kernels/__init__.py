"""Device kernels: pure-XLA reference paths + Pallas TPU kernels for hot ops."""
