"""Scalar/vectorized functions: html→text extraction, text statistics."""
