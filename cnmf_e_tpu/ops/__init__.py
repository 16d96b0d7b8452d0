"""TPU-native numeric kernels for CNMF-E (noise, AR, OASIS, HALS, ring, ...)."""
