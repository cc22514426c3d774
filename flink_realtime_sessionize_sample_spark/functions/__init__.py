"""Scalar / array function layer: portable text, hash, and vector primitives."""
