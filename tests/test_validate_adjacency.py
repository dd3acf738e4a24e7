"""Unit tests for scripts/validate_adjacency.py's scoring instrument.

The script itself trains on the TPU (results recorded in RESULTS.md); these
tests pin the instrument — the thresholded edge precision/recall math and
the learnable-A extraction from a real param tree — so the recorded numbers
stay interpretable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

# import the module directly (like test_serving's `import serve`): parity
# tests put /root/reference at sys.path[0], whose regular `scripts` package
# shadows our namespace one, so `from scripts.validate_adjacency import ...`
# breaks under full-suite collection order.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from validate_adjacency import learned_A, score


def test_score_perfect_recovery():
    truth = [[0.0, 1.0], [0.0, 0.0]]  # thickness -> intensity only
    A = np.array([[0.0, 0.4], [0.01, 0.0]])
    s = score(A, truth, threshold=0.05)
    assert s == {"tp": 1, "fp": 0, "fn": 0, "precision": 1.0, "recall": 1.0}


def test_score_reversed_edge_is_fp_plus_fn():
    truth = [[0.0, 1.0], [0.0, 0.0]]
    A = np.array([[0.0, 0.01], [0.4, 0.0]])  # learned the anti-causal edge
    s = score(A, truth, threshold=0.05)
    assert (s["tp"], s["fp"], s["fn"]) == (0, 1, 1)
    assert s["precision"] == 0.0 and s["recall"] == 0.0


def test_score_uniform_A_has_full_recall_half_precision():
    # the failure mode the 2-var prototype actually shows: both off-diagonal
    # entries grow together, so recall is perfect but precision is 1/2
    truth = [[0.0, 1.0], [0.0, 0.0]]
    A = np.full((2, 2), 0.07)
    s = score(A, truth, threshold=0.05)
    assert s["recall"] == 1.0 and s["precision"] == 0.5


def test_score_ignores_diagonal():
    truth = [[1.0, 0.0], [0.0, 1.0]]  # self-loops only -> zero true edges
    A = np.eye(2) * 10.0
    s = score(A, truth, threshold=0.05)
    assert (s["tp"], s["fp"], s["fn"]) == (0, 0, 0)


def test_score_4var_partial():
    # pendulum-shaped: angle->{shadow_len, shadow_pos}, light->{both}
    truth = np.zeros((4, 4))
    truth[0, 2] = truth[0, 3] = truth[1, 2] = truth[1, 3] = 1.0
    A = np.zeros((4, 4))
    A[0, 2] = 0.3  # found
    A[1, 2] = 0.3  # found
    A[2, 0] = 0.3  # reversed (fp)
    s = score(A, truth, threshold=0.05)
    assert (s["tp"], s["fp"], s["fn"]) == (2, 1, 2)
    assert s["precision"] == pytest.approx(2 / 3)
    assert s["recall"] == pytest.approx(0.5)


def test_learned_A_extraction_from_real_param_tree():
    import jax

    from causaldiffae_tpu.config import create_model
    from tests._tiny_config import tiny_config

    cfg = tiny_config(learn_adjacency=True)
    model = create_model(cfg)
    import jax.numpy as jnp

    B = 2
    x = jnp.zeros((B, cfg.image_size, cfg.image_size, cfg.in_channels))
    t = jnp.zeros((B,), dtype=jnp.int32)
    y = jnp.zeros((B,), dtype=jnp.int32)
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ["params", "reparam", "cfmask", "dropout"])}
    variables = model.init(rngs, x, t, y=y, x_start=x, train=False)
    A = learned_A(variables["params"])
    assert A.shape == (cfg.n_vars, cfg.n_vars)
    assert np.all(A == 0.0)  # zero-init, matching reference nn.py:255-259

    # a static-adjacency tree must fail loud, not return a buffer
    cfg2 = tiny_config(learn_adjacency=False)
    model2 = create_model(cfg2)
    variables2 = model2.init(rngs, x, t, y=y, x_start=x, train=False)
    with pytest.raises(KeyError):
        learned_A(variables2["params"])
