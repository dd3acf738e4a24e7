"""Evaluation stack: counterfactual harness, disentanglement metrics,
anti-causal classifiers, FID, NLL."""

from .classifiers import ClassifierTrainer, classifier_predict_fn, load_classifier
from .counterfactual import (
    make_counterfactual_fn,
    make_prior_sample_fn,
    make_reconstruct_fn,
    resolve_sampler,
)
from .metrics import compute_dci, compute_irs, mcc
from .quality import FID, activation_statistics, frechet_distance
