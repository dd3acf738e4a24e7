"""Data layer: real-dataset loaders, synthetic generators, SCM simulators."""

from .simulators import (
    circuit_scm,
    morphomnist_generate,
    morphomnist_scm,
    pendulum_generate,
    pendulum_scm,
    render_circuit,
    render_morphomnist,
    render_pendulum,
)
from .synthetic import synthetic_dataset, synthetic_iterator
