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
from .loaders import (
    batch_iterator,
    make_data_iterator,
    load_circuit,
    load_data,
    load_idx,
    load_image_folder,
    load_morphomnist,
    load_pendulum,
    save_idx,
)
from .synthetic import synthetic_dataset, synthetic_iterator
