"""Convert a trained vocoder checkpoint to the native engine's binary format
(ref: vocoder_convert_model.py → libwavernn .bin)."""
import argparse
from pathlib import Path

from rtvc_tpu.models import factories
from rtvc_tpu.native.convert import export_wavernn
from rtvc_tpu.train.checkpoints import load_checkpoint

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("checkpoint", type=Path)
    parser.add_argument("-o", "--out", type=Path, default=None)
    parser.add_argument(
        "--model_type", type=str, default=None,
        help="Override the checkpoint's model_type.",
    )
    parser.add_argument(
        "--hp", type=str, default="",
        help="Hyper-parameter overrides as 'k=v,...' (needed only when the "
             "checkpoint was trained with non-default dims and predates "
             "config-in-checkpoint).",
    )
    args = parser.parse_args()

    ckpt = load_checkpoint(args.checkpoint)
    model_type = args.model_type or ckpt.get("model_type") or \
        factories.MODEL_TYPE_FATCHORD

    override_hp = None
    cfg_extras = ckpt.get("extras", {}).get("config")
    if cfg_extras:
        from rtvc_tpu.config.vocoder import WaveRNNParams

        def detuple(v):
            return tuple(detuple(x) for x in v) if isinstance(v, list) else v

        override_hp = WaveRNNParams(
            **{k: detuple(v) for k, v in cfg_extras.items()}
        )
    bundle = factories.init_voc_model(model_type, override_hp=override_hp)
    if args.hp:
        bundle = factories.init_voc_model(
            model_type, override_hp=bundle.config.parse(args.hp)
        )

    if ckpt.get("torch_state") is not None:
        from rtvc_tpu.models.wavernn import import_torch_state

        variables = import_torch_state(ckpt["torch_state"], bundle.dims)
    else:
        variables = {
            "params": ckpt["params"],
            "batch_stats": ckpt["extras"].get(
                "batch_stats", bundle.variables["batch_stats"]
            ),
        }

    out = args.out or args.checkpoint.with_suffix(".bin")
    export_wavernn(variables, bundle.dims, out)
    print("Exported %s (%s) -> %s" % (args.checkpoint, model_type, out))
