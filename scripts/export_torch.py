"""Export a trained checkpoint as a reference-loadable torch ``.pt`` file.

The reverse of the ``.pt`` migration path: models trained HERE load into the
reference's torch ``UNetModel`` (`improved_diffusion/unet.py:279`) via
``model.load_state_dict(torch.load(path))`` — same key set and layouts as
the reference's own ``model*.pt`` / ``ema_checkpoint.pt``
(`train_util.py:319-345`). Roundtrip identity is test-pinned in
``tests/test_torch_parity.py``.

    python scripts/export_torch.py --preset morphomnist_causaldae \
        --ckpt_dir /ckpts/morphomnist --out /tmp/model_export.pt [--use_ema]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", required=True)
    parser.add_argument("--ckpt_dir", required=True)
    parser.add_argument("--out", required=True, help="output .pt path")
    parser.add_argument("--use_ema", action="store_true",
                        help="export the EMA params instead of the raw params")
    args = parser.parse_args()

    import jax

    from causaldiffae_tpu.config import create_model, get_config
    from causaldiffae_tpu.training import eval_params, restore_eval_state
    from causaldiffae_tpu.utils import logger
    from causaldiffae_tpu.utils.torch_port import save_torch_checkpoint

    cfg = get_config(args.preset)
    logger.configure()
    model = create_model(cfg)

    # 1-row template state on host, then restore (shapes don't depend on B)
    state = restore_eval_state(cfg, model, args.ckpt_dir)
    logger.log(f"restored step {int(state.step)} from {args.ckpt_dir}")

    # eval_params errors on a missing EMA key (never a silent raw fallback)
    params = eval_params(state, cfg, use_ema=args.use_ema)
    variables = {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    save_torch_checkpoint(cfg, variables, args.out)
    logger.log(f"wrote reference-format state_dict to {args.out} "
               f"(step {int(state.step)}, {'EMA' if args.use_ema else 'raw'} params)")


if __name__ == "__main__":
    main()
