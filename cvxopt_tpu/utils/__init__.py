"""Utility modules: discrete transforms (fftw equivalent), random
number generation (gsl equivalent), and printing."""

from cvxopt_tpu.utils import fft, rng, printing

__all__ = ["fft", "rng", "printing"]
