"""Scalar/vector function kernels: hashing, text, string similarity, encoders."""

from . import hashing, similarity, strings, text  # noqa: F401
from .encoder import Encoder, HashNgramEncoder  # noqa: F401
