"""Anti-causal classifier training (effectiveness-MAE probes).

One parameterized trainer replacing the reference's four near-identical
Trainer classes (`classifiers.py` / `morphomnist_classifier.py` /
`pendulum_classifier.py` / `circuit_classifier.py`, SURVEY C25): MSE
regression of one causal factor from images with the GaussianConvEncoderClf
trunk, Adam(1e-3), best-val checkpointing.

The whole fit (epochs x batches, incl. best-val tracking) is ONE jitted
lax.scan program: the pools live on device, per-epoch shuffles come from
jax.random.permutation, and the best params are selected in-graph with
jnp.where. The reference's host-side epoch loop costs one dispatch + one
blocking float() per batch - ~5k tunnel round-trips per classifier on a
remote-TPU host (~5 min each); the fused scan is one dispatch total.

Factor column conventions (reference target selections):
  morphomnist: 0=thickness, 1=intensity (`morphomnist_classifier.py:52`,
               `classifiers.py:52`)
  pendulum:    0=angle, 1=light, 2=shadow_len, 3=shadow_pos
  circuit:     0=arm, 1=blue, 2=green, 3=red (`circuit_classifier.py:52`)
"""

from __future__ import annotations

import pickle
from functools import lru_cache
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.encoder import GaussianConvEncoderClf
from ..utils import logger

__all__ = ["ClassifierTrainer", "load_classifier", "classifier_predict_fn"]


@lru_cache(maxsize=8)
def _fused_fit_program(model, lr: float, seed: int, n: int, nb: int,
                       batch_size: int, epochs: int):
    """The jitted whole-fit scan, cached across trainer instances.

    An eval trains one probe per causal factor with IDENTICAL shapes and
    hyperparameters (the factor is applied by slicing ``c`` before the
    call), so without this cache every factor re-traces and re-compiles
    the same program — ~2 min of duplicated cold XLA compile per factor
    through a remote-TPU tunnel. The key is all hashable config (the flax
    module compares by its dataclass fields); the optimizer is rebuilt
    from ``lr`` inside so optax's closure identity never misses the cache.
    """
    tx = optax.adam(lr)

    def run(params, batch_stats, opt_state, x, c, xv, cv):
        def val_mse(p, bs):
            out = model.apply({"params": p, "batch_stats": bs}, xv, train=False)
            return jnp.mean((out - cv) ** 2)

        def train_batch(carry, sel):
            p, bs, opt = carry

            def loss_fn(pp):
                out, mut = model.apply(
                    {"params": pp, "batch_stats": bs}, x[sel], train=True,
                    mutable=["batch_stats"],
                )
                return jnp.mean((out - c[sel]) ** 2), mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), new_bs, opt), loss

        def epoch_step(carry, epoch):
            p, bs, opt, best_val, best_p, best_bs = carry
            perm = jax.random.permutation(
                jax.random.fold_in(jax.random.PRNGKey(seed), epoch), n)
            sels = perm[: nb * batch_size].reshape(nb, batch_size)
            (p, bs, opt), losses = jax.lax.scan(train_batch, (p, bs, opt), sels)
            val = val_mse(p, bs)
            better = val < best_val
            best_val = jnp.where(better, val, best_val)
            sel_tree = lambda a, b: jnp.where(better, a, b)
            best_p = jax.tree_util.tree_map(sel_tree, p, best_p)
            best_bs = jax.tree_util.tree_map(sel_tree, bs, best_bs)
            return (p, bs, opt, best_val, best_p, best_bs), (jnp.mean(losses), val)

        carry = (params, batch_stats, opt_state,
                 jnp.asarray(jnp.inf, jnp.float32), params, batch_stats)
        carry, hist = jax.lax.scan(epoch_step, carry, jnp.arange(epochs))
        return carry, hist

    return jax.jit(run)


class ClassifierTrainer:
    def __init__(self, dataset: str, factor: int, n_vars: int,
                 lr: float = 1e-3, seed: int = 0,
                 hidden_dims: Optional[Tuple[int, ...]] = None):
        self.dataset = dataset
        self.factor = factor
        self.model = GaussianConvEncoderClf(num_vars=n_vars, hidden_dims=hidden_dims)
        self.lr = lr
        self.tx = optax.adam(lr)
        self.seed = seed
        self.best_val = np.inf
        self.best_variables = None

    def init(self, sample_images: jnp.ndarray):
        variables = self.model.init(
            jax.random.PRNGKey(self.seed), sample_images, train=True
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

        factor = self.factor
        model, tx = self.model, self.tx

        @jax.jit
        def train_step(params, batch_stats, opt_state, images, c):
            target = c[:, factor:factor + 1]

            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, images, train=True,
                    mutable=["batch_stats"],
                )
                return jnp.mean((out - target) ** 2), mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        @jax.jit
        def eval_step(params, batch_stats, images, c):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, images, train=False
            )
            return jnp.mean((out - c[:, factor:factor + 1]) ** 2)

        self._train_step = train_step
        self._eval_step = eval_step

    # above this many pool bytes the fused scan (whole train+val pools
    # resident in HBM next to the diffusion model) risks RESOURCE_EXHAUSTED;
    # fall back to streaming per-batch transfers like the reference's loop
    FUSED_POOL_BYTE_LIMIT = 2 << 30

    def fit(self, train_data: Dict[str, np.ndarray], val_data: Dict[str, np.ndarray],
            epochs: int = 100, batch_size: int = 128, log_every: int = 10):
        """Reference `classifiers.py:46-141`: epochs of MSE + best-val save.

        Runs as one jitted scan-of-scans; metrics come back to the host in a
        single transfer after the last epoch. Pools too large for device
        residency stream one batch at a time instead (same math, host loop).
        """
        pool_bytes = sum(np.asarray(d["image"]).nbytes
                         for d in (train_data, val_data))
        if pool_bytes > self.FUSED_POOL_BYTE_LIMIT:
            return self._fit_streaming(train_data, val_data, epochs,
                                       batch_size, log_every)
        n = len(train_data["image"])
        # drop-last batching, same coverage as the reference's
        # range(0, n - batch_size + 1, batch_size) stride
        nb = max(1, (n - batch_size) // batch_size + 1)
        batch_size = min(batch_size, n)
        self.init(jnp.asarray(train_data["image"][:2]))
        run = _fused_fit_program(
            self.model, self.lr, self.seed, n, nb, batch_size, epochs)
        factor = self.factor
        carry, (tr_hist, val_hist) = run(
            self.params, self.batch_stats, self.opt_state,
            jnp.asarray(train_data["image"]),
            jnp.asarray(train_data["c"][:, factor:factor + 1]),
            jnp.asarray(val_data["image"]),
            jnp.asarray(val_data["c"][:, factor:factor + 1]),
        )
        # one host transfer for everything
        self.params, self.batch_stats, self.opt_state = carry[0], carry[1], carry[2]
        self.best_val = float(carry[3])
        self.best_variables = jax.device_get({"params": carry[4], "batch_stats": carry[5]})
        tr_hist, val_hist = np.asarray(tr_hist), np.asarray(val_hist)
        for epoch in range(0, epochs, log_every):
            logger.log(
                f"clf[{self.dataset}:{self.factor}] epoch {epoch} "
                f"train {tr_hist[epoch]:.5f} val {val_hist[epoch]:.5f} "
                f"best {np.min(val_hist[:epoch + 1]):.5f}"
            )
        return self.best_variables

    def _fit_streaming(self, train_data, val_data, epochs: int,
                       batch_size: int, log_every: int):
        """Host epoch loop with per-batch device transfers (the reference's
        `classifiers.py:46-141` shape) for pools too big to live in HBM."""
        n = len(train_data["image"])
        batch_size = min(batch_size, n)
        self.init(jnp.asarray(train_data["image"][:2]))
        rng = np.random.RandomState(self.seed)
        factor = self.factor
        for epoch in range(epochs):
            perm = rng.permutation(n)
            losses = []
            for i in range(0, n - batch_size + 1, batch_size):
                sel = perm[i:i + batch_size]
                self.params, self.batch_stats, self.opt_state, loss = (
                    self._train_step(
                        self.params, self.batch_stats, self.opt_state,
                        jnp.asarray(train_data["image"][sel]),
                        jnp.asarray(train_data["c"][sel]),
                    ))
                losses.append(loss)
            val = self.validate(val_data, batch_size)
            if val < self.best_val:
                self.best_val = val
                self.best_variables = jax.device_get(
                    {"params": self.params, "batch_stats": self.batch_stats})
            if epoch % log_every == 0:
                logger.log(
                    f"clf[{self.dataset}:{self.factor}] epoch {epoch} "
                    f"train {float(np.mean([float(l) for l in losses])):.5f} "
                    f"val {val:.5f} best {self.best_val:.5f}"
                )
        return self.best_variables

    def validate(self, val_data, batch_size=128) -> float:
        n = len(val_data["image"])
        losses = []
        for i in range(0, n, batch_size):
            losses.append(float(self._eval_step(
                self.params, self.batch_stats,
                jnp.asarray(val_data["image"][i:i + batch_size]),
                jnp.asarray(val_data["c"][i:i + batch_size]),
            )))
        return float(np.mean(losses))

    def save_best(self, path: str):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({
                "variables": self.best_variables,
                "dataset": self.dataset,
                "factor": self.factor,
                "best_val": self.best_val,
            }, f)


def load_classifier(path: str, n_vars: int,
                    hidden_dims: Optional[Tuple[int, ...]] = None,
                    image_size: Optional[int] = None):
    """Load a saved classifier -> (model, variables, meta).

    Accepts this framework's pickles AND the reference's torch
    ``classifier_<factor>_best.pth`` files (`classifiers.py:114-119` etc.) —
    the latter need ``image_size`` to recover the head's flatten layout."""
    model = GaussianConvEncoderClf(num_vars=n_vars, hidden_dims=hidden_dims)
    if str(path).endswith((".pt", ".pth")):
        if image_size is None:
            raise ValueError("image_size is required to load a torch "
                             "classifier checkpoint")
        from ..utils.torch_port import load_torch_classifier

        variables = load_torch_classifier(path, image_size)
        return model, variables, {"source": "torch", "path": str(path),
                                  "best_val": float("nan")}
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return model, blob["variables"], blob


def classifier_predict_fn(model: GaussianConvEncoderClf, variables):
    @jax.jit
    def predict(images):
        return model.apply(variables, images, train=False)[:, 0]

    return predict
