"""Reference classifier .pth probes drive the shipped eval CLI directly.

A user migrating from the reference has `classifier_<factor>_best.pth`
files (its trainers' save format, `classifiers.py:114-119`). The eval CLI
must pick those up from --classifier_dir instead of quick-training new
probes. Forward parity of the port itself is covered in
test_torch_parity.py; this drives the CLI wiring end to end.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, str(REFERENCE_ROOT))

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import causaldiffae_tpu.config as config_mod
from causaldiffae_tpu.config import create_diffusion, create_model
from causaldiffae_tpu.data import synthetic_iterator
from causaldiffae_tpu.training.loop import TrainLoop


def test_eval_cli_uses_reference_pth_probes(tmp_path):
    from _tiny_config import tiny_config

    from improved_diffusion.nn import GaussianConvEncoderClf as TorchClf

    cfg = tiny_config(name="refclf_tiny", eval_timestep_respacing="6",
                      abduction_t=5, total_steps=1, save_interval=1,
                      log_interval=1)
    config_mod.PRESETS["refclf_tiny"] = cfg

    ckpt = tmp_path / "ckpt"
    loop = TrainLoop(cfg, create_model(cfg), create_diffusion(cfg),
                     synthetic_iterator(cfg.dataset, cfg.batch_size, pool=16),
                     ckpt_dir=str(ckpt), use_mesh=False)
    loop.run_loop(num_steps=1)

    clf_dir = tmp_path / "clf"
    clf_dir.mkdir()
    torch.manual_seed(0)
    for factor in ("thickness", "intensity"):
        clf = TorchClf(in_channels=1, latent_dim=512, num_vars=2)
        torch.save(clf.state_dict(), clf_dir / f"classifier_{factor}_best.pth")

    import counterfactual_test as ct_cli

    old = sys.argv
    sys.argv = ["counterfactual_test.py", "--preset", "refclf_tiny",
                "--ckpt_dir", str(ckpt), "--synthetic",
                "--num_samples", "4", "--batch_size", "4",
                "--out_dir", str(tmp_path / "out"),
                "--classifier_dir", str(clf_dir), "--no_recon"]
    try:
        result = ct_cli.main()
    finally:
        sys.argv = old

    # MAEs computed through the imported probes; their val MSE is honestly
    # NaN (a torch .pth carries no val record)
    assert np.isfinite(result["mae_thickness"])
    assert np.isfinite(result["mae_intensity"])
    assert np.isnan(result["clf_val_mse_thickness"])
    # the .pth probes were used: no pickle probe was quick-trained
    assert not [p for p in os.listdir(clf_dir) if p.endswith(".pkl")]
