"""Pure (Ray-free) vectorized kernels: hashing, shingling, sketches, audio, text."""
