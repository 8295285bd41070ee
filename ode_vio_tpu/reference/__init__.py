"""Torch-side replica of the reference stack, for parity verification.

Everything here requires torch (cpu build is baked into the image) and is
imported lazily — the TPU serving/training paths never touch it.
"""
