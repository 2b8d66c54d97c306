"""Device-side primitive ops (mask math, position encodings, fbank, CIF...).

Everything in this package is pure-functional JAX: static shapes, jittable,
differentiable where it makes sense, designed around the TPU compilation
model (no data-dependent Python control flow, MXU-sized matmuls).
"""
