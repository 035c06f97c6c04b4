"""Numerical operators for the audio -> spectrum -> pixels pipeline.

Everything in this package is a pure function over statically-shaped
arrays, safe to ``jax.jit`` / ``jax.vmap`` and designed to map onto TPU
compute units (MXU for the matmul-expressed FFT and resample stages,
VPU for the elementwise dynamics).
"""
